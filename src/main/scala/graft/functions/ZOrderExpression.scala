package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two non-negative integer dimensions —
  * the clustering key behind multi-dimensional data skipping (Delta/
  * Iceberg `OPTIMIZE ZORDER BY`): sorting by the interleaved bits keeps
  * rows that are close in EITHER dimension close in the file order, so
  * per-file min/max zone maps stay tight on BOTH columns and a scan can
  * prune files for predicates on either one.
  *
  * Bit contract (shared with the DuckDB oracle in
  * [[graft.queries.Layout]] q94): the low [[ZValue.Bits]] = 21 bits of
  * each input are interleaved, `left` on even bit positions, `right` on
  * odd — a 42-bit z-value. Higher input bits are deliberately masked
  * (both engines identically); 21+21 keeps the result well inside a
  * BIGINT and covers 2M distinct values per dimension — rank- or
  * bucket-normalize wider domains first (the layout helper does).
  *
  * Why native: the HOF equivalent is a 21-element interpreted-lambda
  * fold per row; this is one tight integer loop emitted as a static
  * call, keeping the surrounding plan inside WholeStageCodegen.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_value requires (bigint, bigint), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZValue.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZValue.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Bits interleaved per dimension. */
  val Bits = 21

  def compute(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
