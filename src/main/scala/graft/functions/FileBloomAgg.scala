package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Small per-file Bloom filter over STRINGIFIED keys — the point-lookup
  * complement to min/max zone maps in the manifest log
  * ([[graft.sinks.ManifestCatalog.appendWithStats]]): a high-cardinality
  * key scattered uniformly across files defeats range stats (every
  * file's [min,max] covers every probe), but a 2 KB per-file bloom
  * answers "definitely not in this file" and prunes the other files of
  * a point lookup.
  *
  * Same Kirsch–Mitzenmacher double-hash family as [[BloomAgg]] (first/
  * second 20-bit windows of md5 of the key string), shrunk to
  * [[FileBloomAgg.MBits]] = 2^14 bits: the filter rides the COMMIT LOG,
  * so size is paid per (file, column) on every log read — at ~10k keys
  * per file-group the false-positive rate is ~2-3%, which only costs a
  * wasted read, never a wrong answer (no-false-negative soundness is
  * what pruning relies on; spec-pinned).
  *
  * Mergeable (word-wise OR) ⇒ map-side partials; input is the CAST
  * string form of the column so one Aggregator serves long and string
  * keys alike, matching the stats block's string-form min/max contract.
  */
class FileBloomAgg extends Aggregator[String, Array[Long], Array[Byte]] {
  import FileBloomAgg._

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    if (key != null) {
      var i = 0
      val ps = positions(key)
      while (i < K) {
        val pos = ps(i)
        buf(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      a(i) |= b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object FileBloomAgg {
  val MBits: Int = 1 << 14
  val K: Int = 4
  val Words: Int = MBits / 64

  /** K probe positions for a key's string form: h1/h2 are the first and
    * second 20-bit windows of md5(key), `pos_i = (h1 + i*h2) mod m` —
    * the [[BloomAgg]] family at file-filter size. */
  def positions(key: String): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val h1 = ((md(0) & 0xffL) << 12) | ((md(1) & 0xffL) << 4) |
      ((md(2) & 0xf0L) >> 4)
    val h2 = ((md(2) & 0x0fL) << 16) | ((md(3) & 0xffL) << 8) |
      (md(4) & 0xffL)
    Array.tabulate(K)(i => ((h1 + i * h2) % MBits).toInt)
  }

  /** Driver-side membership probe over the packed byte form (the
    * pruning path reads filters straight out of the decoded manifest). */
  def mightContain(packed: Array[Byte], key: String): Boolean = {
    val ps = positions(key)
    ps.forall { pos =>
      val byteIdx = (pos >> 6) * 8 + 7 - ((pos & 63) >> 3)
      (packed(byteIdx) >> (pos & 7) & 1) == 1
    }
  }
}
