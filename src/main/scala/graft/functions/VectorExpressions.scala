package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

private[functions] trait FloatArrayInputs { self: BinaryExpression =>
  // AbstractDataType (hence ExpectsInputTypes) is private[sql] in Spark 4,
  // so validate shapes directly.
  def checkFloatArrays(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
}

/** Native Catalyst expression for cosine similarity over `array<float>`
  * embedding columns.
  *
  * Why not `zip_with`+`aggregate`: Spark's higher-order-function lambdas
  * are interpreted per element (no codegen), which at 100 TB × 64-dim
  * pair-scans is the hot loop. This expression generates a tight Java
  * loop inside WholeStageCodegen instead.
  *
  * Determinism contract (oracle parity): a strict left-to-right fold in
  * doubles — `dot += x(i)*y(i)` ascending — matching DuckDB
  * `list_reduce(..., (a,b) -> a+b)`; float→double widening is exact, so
  * both engines produce bit-identical doubles.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs {

  override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays()
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // NULL result (never NaN) for mismatched lengths or zero-norm inputs:
  // NaN sorts as the LARGEST double in Spark, so a zero/padding vector
  // would otherwise rank as every probe's top neighbor; null sorts last
  // under DESC and signals the data problem. Null ELEMENTS read as 0.0
  // (ArrayData contract) — documented, deterministic.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product twin of [[CosineSim]] (same fold order; null on length
  * mismatch — a dimension mixup must not silently truncate). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs {

  override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays()
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm with the same left-fold contract as [[CosineSim]]'s
  * denominator terms: `sqrt(Σ x_i²)` accumulated ascending — so
  * `dot_product(a,b) / (vec_norm(a) * vec_norm(b))` is bit-identical to
  * `cosine_sim(a,b)`. Precomputing norms once per row turns the ANN
  * pair-scan's per-pair cost from 3 folds into 1. */
case class VecNorm(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_norm requires array<float>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var na = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      na += xi * xi; i += 1
    }
    math.sqrt(na)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = $c.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $c.getFloat($i);
         |  $na += $xi * $xi;
         |}
         |${ev.value} = java.lang.Math.sqrt($na);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session-level registration so the expressions are usable from
  * `expr("cosine_sim(a, b)")` / SQL. Idempotent. */
object VectorFunctions {
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      arity("cosine_sim", 2)(e => CosineSim(e(0), e(1))), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      arity("dot_product", 2)(e => DotProduct(e(0), e(1))), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      arity("minhash_sig", 1)(e => MinHashSig(e.head)), "built-in")
    reg.createOrReplaceTempFunction("simhash_sig",
      arity("simhash_sig", 1)(e => SimHash(e.head)), "built-in")
    reg.createOrReplaceTempFunction("simhash_wide",
      arity("simhash_wide", 1)(e => SimHashWide(e.head)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      arity("vec_norm", 1)(e => VecNorm(e.head)), "built-in")
    reg.createOrReplaceTempFunction("z_value",
      arity("z_value", 2)(e => ZValue(e(0), e(1))), "built-in")
  }
}
