package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** MinHash signature over 3-token shingles, as one native expression.
  *
  * Semantics (bit-compatible with the DuckDB oracle in
  * [[graft.queries.Dedup]]):
  *   shingle  = tokens(i) + " " + tokens(i+1) + " " + tokens(i+2)
  *   h        = first 5 hex chars of md5(shingle) as an integer (20 bits)
  *   sig(k)   = min over shingles of (A(k)*h + B(k)) mod P
  * Documents with fewer than 3 tokens yield NULL (no shingles).
  *
  * Why native: the equivalent `transform(sequence(0,15), i ->
  * array_min(transform(...)))` pipeline evaluates interpreted lambdas —
  * 16 array traversals per row with per-element expression-tree dispatch.
  * This is one md5 per shingle and a fused k-way min in a tight loop,
  * ~10× faster, and it keeps the surrounding plan inside
  * WholeStageCodegen (codegen emits a single static call).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // The static call keeps this row inside WholeStageCodegen; the
      // expensive loop lives in compiled Scala, not interpreted Catalyst.
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 16-bit SimHash over the DISTINCT tokens of the input array — native
  * twin of the `aggregate(transform(sequence(0,15), ...))` HOF pipeline
  * (which evaluates ~16×|tokens| interpreted lambda calls per row; this is
  * one md5 per distinct token and an integer bit loop).
  *
  * Bit-compatible with the DuckDB oracle in [[graft.queries.Dedup]] q32:
  * token hash = first 20 bits of md5; bit j of the sketch is set iff the
  * majority of token hashes have bit j set (strictly positive vote sum).
  */
case class SimHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  def compute(tokens: ArrayData): Long = {
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](16)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      // null tokens skipped (would NPE on getBytes and kill the query)
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (t != null && seen.add(t)) {
        val h = MinHashSig.hash20(t)
        var j = 0
        while (j < 16) {
          votes(j) += (((h >> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }
}

object MinHashSig {
  /** Largest prime below 2^20; LSH hash-family modulus. */
  val P = 1048573L
  val K = 16
  val A: Array[Long] =
    (1 to K).map(i => (i.toLong * 2654435761L) % P).map(a => if (a == 0) 1L else a).toArray
  val B: Array[Long] = (1 to K).map(i => (i.toLong * 40503L) % P).toArray

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private[functions] def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = digest.get()
    d.reset()
    d.digest(bytes)
  }

  /** 20-bit integer = first 5 hex chars of the md5 digest
    * (== `conv(substring(md5(s),1,5),16,10)`). */
  def hash20(bytes: Array[Byte]): Long = {
    val md = md5(bytes)
    (((md(0) & 0xffL) << 12) | ((md(1) & 0xffL) << 4) |
      ((md(2) & 0xf0L) >> 4))
  }

  /** 60-bit integer = first 15 hex chars of the md5 digest
    * (== `conv(substring(md5(s),1,15),16,10)`). */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5(bytes)
    ((md(0) & 0xffL) << 52) | ((md(1) & 0xffL) << 44) |
      ((md(2) & 0xffL) << 36) | ((md(3) & 0xffL) << 28) |
      ((md(4) & 0xffL) << 20) | ((md(5) & 0xffL) << 12) |
      ((md(6) & 0xffL) << 4) | ((md(7) & 0xf0L) >> 4)
  }

  /** Null iff fewer than 3 non-null tokens (no shingles). Null elements
    * are skipped — SQL callers can pass arrays with null slots, and an
    * executor NPE would kill the query (the poison-halt again). Token
    * byte arrays slide through a 3-slot window so each token is
    * materialized once, not three times. */
  def compute(tokens: ArrayData): GenericArrayData = {
    val n = tokens.numElements()
    val toks = new scala.collection.mutable.ArrayBuffer[Array[Byte]](n)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) toks += tokens.getUTF8String(j).getBytes
      j += 1
    }
    if (toks.length < 3) return null
    val sig = Array.fill[Long](K)(Long.MaxValue)
    val sp = ' '.toByte
    var i = 0
    while (i <= toks.length - 3) {
      val t0 = toks(i); val t1 = toks(i + 1); val t2 = toks(i + 2)
      val buf = new Array[Byte](t0.length + t1.length + t2.length + 2)
      System.arraycopy(t0, 0, buf, 0, t0.length)
      buf(t0.length) = sp
      System.arraycopy(t1, 0, buf, t0.length + 1, t1.length)
      buf(t0.length + t1.length + 1) = sp
      System.arraycopy(t2, 0, buf, t0.length + t1.length + 2, t2.length)
      val h = hash20(buf)
      var k = 0
      while (k < K) {
        val v = (A(k) * h + B(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(java.lang.Long.valueOf(_): Any))
  }

  /** UTF8String variant used by token-level hashing (SimHash). */
  def hash20(s: UTF8String): Long = hash20(s.getBytes)
}

/** 60-bit SimHash over the DISTINCT 3-token shingles of the input array —
  * the Hamming-space near-dup sketch (q80). Token-level 16-bit [[SimHash]]
  * cannot separate near-dups on narrow vocabularies (any two docs drawn
  * from the same few hundred words share most distinct TOKENS, measured
  * 5.8M false pairs at sf0.1); shingle features recover the same
  * discrimination MinHash gets from its shingle space, and 60 bits keeps
  * the whole sketch in one long (15 md5 hex chars) so banding and XOR
  * distance stay integer ops.
  *
  * Bit-compatible with the DuckDB oracle in [[graft.queries.Dedup]] q80:
  * shingle hash = first 60 bits of md5; bit j set iff the majority of
  * distinct-shingle hashes have bit j set (strictly positive vote sum);
  * fewer than 3 tokens → no shingles → sketch 0 (matching SQL, where the
  * empty vote sum is NULL and every CASE arm yields 0).
  */
case class SimHashWide(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_wide requires array<string>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_wide"

  override def nullSafeEval(input: Any): Any =
    SimHashWide.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashWide.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashWide {
  private val Bits = 60

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val toks = new scala.collection.mutable.ArrayBuffer[Array[Byte]](n)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) toks += tokens.getUTF8String(j).getBytes
      j += 1
    }
    if (toks.length < 3) return 0L
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](Bits)
    val sp = ' '.toByte
    var i = 0
    while (i <= toks.length - 3) {
      val t0 = toks(i); val t1 = toks(i + 1); val t2 = toks(i + 2)
      val buf = new Array[Byte](t0.length + t1.length + t2.length + 2)
      System.arraycopy(t0, 0, buf, 0, t0.length)
      buf(t0.length) = sp
      System.arraycopy(t1, 0, buf, t0.length + 1, t1.length)
      buf(t0.length + t1.length + 1) = sp
      System.arraycopy(t2, 0, buf, t0.length + t1.length + 2, t2.length)
      if (seen.add(UTF8String.fromBytes(buf))) {
        val h = MinHashSig.hash60(buf)
        var b = 0
        while (b < Bits) {
          votes(b) += (((h >> b) & 1L).toInt * 2) - 1
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}
