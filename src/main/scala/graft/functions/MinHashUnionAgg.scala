package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §7.3's custom-aggregate surface):
  * element-wise MIN over MinHash signatures.
  *
  * Property that makes this useful: the element-wise min of the signatures
  * of documents d1..dn IS the MinHash signature of the UNION of their
  * shingle sets — so grouping by any key and folding with this aggregator
  * yields a per-group sketch whose pairwise equal-position fraction
  * estimates the Jaccard similarity of the groups' combined vocabularies.
  * Mergeable (associative+commutative min) ⇒ map-side partial aggregation
  * works; the shuffle carries one 16-long array per group per partition.
  */
object MinHashUnionAgg
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] =
    Array.fill(MinHashSig.K)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      var i = 0
      while (i < MinHashSig.K && i < sig.length) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MinHashSig.K) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  // a never-updated buffer (all inputs null/absent) must NOT surface as a
  // valid-looking sketch — two such groups would compare as 100% similar
  override def finish(buf: Array[Long]): Seq[Long] =
    if (buf.forall(_ == Long.MaxValue)) null else buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
