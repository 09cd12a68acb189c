package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch over tokens, as a typed mergeable `Aggregator` —
  * the streaming-friendly frequency-estimation sketch (Cormode &
  * Muthukrishnan '05) alongside the engine's HLL++ (q18), GK quantiles
  * (q19) and MinHash-union (q35) sketches.
  *
  * Layout: [[D]] hash rows × [[W]] counters, flattened row-major into one
  * `Array[Long]`. The row hashes reuse the md5-derived 20-bit token hash
  * and the `(A(i)*h + B(i)) mod P` universal family from [[MinHashSig]]
  * (identical constants — so a DuckDB oracle can reconstruct every cell
  * from exact token counts, which is how q81 pins the whole sketch
  * datapath bit-exactly, not just an error bound).
  *
  * Mergeable: cells add (associative+commutative) ⇒ map-side partial
  * aggregation works and the shuffle carries one D×W=32 KB buffer per
  * partition — at 100 TB the sketch cost is per-partition, not per-row.
  * Point estimate: `min` over the D cells a token hashes to; always ≥ the
  * true count (soundness is a structural property, asserted in spec and
  * emitted as a column in q81).
  */
object CountMinAgg extends Aggregator[String, Array[Long], Seq[Long]] {
  val D = 4
  val W = 1024

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    if (token != null) {
      val h = MinHashSig.hash20(token.getBytes("UTF-8"))
      var i = 0
      while (i < D) {
        val b = (((MinHashSig.A(i) * h + MinHashSig.B(i)) % MinHashSig.P) % W).toInt
        buf(i * W + b) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
