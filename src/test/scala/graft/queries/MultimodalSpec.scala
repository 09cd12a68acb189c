package graft.queries

import graft.TestSpark
import graft.queries.Multimodal.{DecodedMeta, MediaDecode, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

/** The decode seam's codec branch: REAL encoded images (pure-JDK
  * ImageIO, generated in-memory — no fixtures on disk) must decode to
  * their true dimensions, while non-image blobs (the fixture's md5
  * bytes) fall back to the deterministic stub the oracle replays. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("real PNG and JPEG blobs decode to true dimensions") {
    assert(MediaDecode.decodeImage(encode(12, 7, "png")) === Some((12, 7)))
    assert(MediaDecode.decodeImage(encode(5, 9, "jpg")) === Some((5, 9)))
  }

  test("non-image blobs fall back to the deterministic stub") {
    val md5ish = java.security.MessageDigest.getInstance("MD5")
      .digest("fixture text".getBytes("UTF-8"))
    assert(MediaDecode.decodeImage(md5ish).isEmpty)
    val (w, h) = MediaDecode.decode(md5ish)
    assert(w == (md5ish(0) & 0xff) + 1 && h == (md5ish(1) & 0xff) + 1)
  }

  test("a JPEG-magic prefix that is not a real stream still reaches the stub") {
    // 2^-16 of md5 blobs start with ff d8; ImageIO must reject them
    // (not throw) and the stub must own the row
    val fake = Array[Byte](0xff.toByte, 0xd8.toByte, 3, 4, 5, 6, 7, 8)
    assert(MediaDecode.decodeImage(fake).isEmpty)
    assert(MediaDecode.decode(fake) == ((0xff + 1, 0xd8 + 1)))
  }

  test("resizePartitions fits real and stub media with one geometry") {
    import graft.queries.Multimodal.ResizedMeta
    import spark.implicits._
    val png = encode(200, 100, "png") // real codec branch, needs downscale
    val tiny = encode(12, 7, "png")   // real, already fits: untouched
    val raw = Array[Byte](199.toByte, 99, 0, 0) // stub dims (200, 100)
    val ds = Seq(
      MediaRecord(1L, png, "png"),
      MediaRecord(2L, tiny, "png"),
      MediaRecord(3L, raw, "webp")).toDS().repartition(2)
    val out = Multimodal.MediaDecode.resizePartitions(ds, target = 64)
      .collect().map(m => m.doc_id -> m).toMap
    // 200×100 → ceil-fit into 64: (64, 32), scale 64/200 = 0.32
    assert(out(1L) === ResizedMeta(1L, 200, 100, 64, 32, 320000L))
    assert(out(2L) === ResizedMeta(2L, 12, 7, 12, 7, 1000000L))
    // stub blob with the same dims must produce identical geometry
    assert(out(3L) === ResizedMeta(3L, 200, 100, 64, 32, 320000L))
    // ceil rounding never collapses an edge: extreme aspect 256×1
    val sliver = Multimodal.MediaDecode.fitDims(256, 1, 64)
    assert(sliver === ((64, 1, 250000L)))
  }

  test("extractFeatures: real images yield geometry+luma, stubs yield bytes") {
    import graft.queries.Multimodal.MediaDecode.extractFeatures
    val png = encode(10, 4, "png")
    val f = extractFeatures(png)
    assert(f.length == 8 && f(0) == 10 && f(1) == 4)
    // luma samples are within range and deterministic across calls
    assert(f.drop(2).forall(v => v >= 0 && v <= 255))
    assert(extractFeatures(png).toSeq == f.toSeq)
    // stub branch: first 8 bytes, zero-padded when short
    val stub = extractFeatures(Array[Byte](7, 200.toByte, 3))
    assert(stub.toSeq == Seq(7, 200, 3, 0, 0, 0, 0, 0))
  }

  test("decodePartitions routes codec and stub rows through one batch") {
    import spark.implicits._
    val png = encode(32, 16, "png")
    val raw = Array[Byte](9, 4, 0, 0)
    val ds = Seq(
      MediaRecord(1L, png, "png"),
      MediaRecord(2L, raw, "webp")).toDS().repartition(2)
    val out = MediaDecode.decodePartitions(ds).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(1L) === DecodedMeta(1L, 32, 16, 512, 2.0))
    assert(out(2L) === DecodedMeta(2L, 10, 5, 50, 2.0))
  }
}
