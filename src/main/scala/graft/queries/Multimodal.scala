package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing (north-star surface): media as opaque
  * `binary` payloads + typed metadata, decoded per partition.
  *
  * No image/audio codecs exist in this container, so the DECODE step is a
  * deterministic stand-in (header-byte arithmetic over the blob — marked
  * at [[MediaDecode.decodeStub]]); everything Spark-side is real: the
  * binary column, the metadata struct schema, the `Dataset[T]`
  * `mapPartitions` batch shape (one decoder init per partition, streamed
  * rows — exactly how a JNI/FFmpeg/JPEG decoder would be mounted), and the
  * frame-sampling explode.
  *
  * Media bytes are synthesized deterministically from `documents.text`
  * (md5 → 16 bytes), so DuckDB oracles can reproduce every derived value
  * from the hex string.
  */
object Multimodal {

  /** The typed shape a real pipeline would carry. */
  final case class MediaRecord(doc_id: Long, blob: Array[Byte], fmt: String)
  final case class DecodedMeta(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, aspect: Double)

  object MediaDecode {
    /** DECODE STUB — stands in for the real codec call. Reads "header"
      * bytes 0 and 1 as width/height, exactly reproducible in SQL from the
      * md5 hex. A production build swaps only this function body. */
    def decodeStub(blob: Array[Byte]): (Int, Int) = {
      val w = (blob(0) & 0xff) + 1
      val h = (blob(1) & 0xff) + 1
      (w, h)
    }

    /** Per-partition decode: init once per partition (the expensive codec
      * handle), stream rows through it — the mapPartitions batch shape. */
    def decodePartitions(ds: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
      import ds.sparkSession.implicits._
      ds.mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map { m =>
          val (w, h) = decodeStub(m.blob)
          DecodedMeta(m.doc_id, w, h, w * h, w.toDouble / h)
        }
      }
    }
  }

  /** documents → (doc_id, blob binary, fmt) media frame. */
  private def media(s: SparkSession, d: String) =
    Tables.documents(s, d).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("blob"),
      when(col("source") === "src0", "png")
        .when(col("source") === "src1", "jpeg")
        .otherwise("webp").as("fmt"))

  // ------------------------------------------------------------- q60
  // Binary column + metadata struct, all relational (no decode): the
  // storage/schema layer of a multimodal table. The binary column lives
  // INSIDE the query (length/hex are computed from it); the output
  // projects its hex form — the driver's pandas oracle gate cannot
  // hash/sort raw bytes (round-1 q60 failure).
  private val q60 = QueryDef.of(
    (s, d) => media(s, d)
      .select(col("doc_id"), hex(col("blob")).as("blob_hex"), col("fmt"),
        length(col("blob")).as("n_bytes"),
        substring(hex(col("blob")), 1, 8).as("magic"))
      .orderBy(col("doc_id")),
    """SELECT doc_id, upper(md5(text)) AS blob_hex,
      |  CASE WHEN source = 'src0' THEN 'png'
      |       WHEN source = 'src1' THEN 'jpeg'
      |       ELSE 'webp' END AS fmt,
      |  octet_length(unhex(md5(text))) AS n_bytes,
      |  upper(substring(md5(text), 1, 8)) AS magic
      |FROM documents
      |ORDER BY doc_id""".stripMargin)

  // ------------------------------------------------------------- q61
  // The typed mapPartitions decode path (Dataset[MediaRecord] →
  // Dataset[DecodedMeta]); stub decode, real batch shape.
  private val q61 = QueryDef.of(
    (s, d) => {
      import s.implicits._
      MediaDecode.decodePartitions(media(s, d).as[MediaRecord])
        .toDF().orderBy(col("doc_id"))
    },
    """SELECT doc_id,
      |  CAST('0x' || substring(md5(text), 1, 2) AS INT) + 1 AS width,
      |  CAST('0x' || substring(md5(text), 3, 2) AS INT) + 1 AS height,
      |  (CAST('0x' || substring(md5(text), 1, 2) AS INT) + 1)
      |    * (CAST('0x' || substring(md5(text), 3, 2) AS INT) + 1) AS n_pixels,
      |  CAST(CAST('0x' || substring(md5(text), 1, 2) AS INT) + 1 AS DOUBLE)
      |    / (CAST('0x' || substring(md5(text), 3, 2) AS INT) + 1) AS aspect
      |FROM documents
      |ORDER BY doc_id""".stripMargin)

  // ------------------------------------------------------------- q62
  // Frame sampling: treat the blob as 16 one-byte "frames", keep every
  // 4th (posexplode → filter). The generator/explode shape of video
  // pipelines: one input row fans out to a bounded frame set.
  private val q62 = QueryDef.of(
    (s, d) => media(s, d)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 15), i -> cast(conv(substring(hex(blob), i*2+1, 2), 16, 10) as int))"))
          .as(Seq("frame_idx", "frame_val")))
      .filter(col("frame_idx") % 4 === 0)
      .orderBy(col("doc_id"), col("frame_idx")),
    """SELECT doc_id, i AS frame_idx,
      |  CAST('0x' || substring(md5(text), i*2+1, 2) AS INT) AS frame_val
      |FROM documents CROSS JOIN generate_series(0, 15) AS t(i)
      |WHERE i % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q60_multimodal_meta" -> q60,
    "q61_multimodal_decode" -> q61,
    "q62_frame_sample" -> q62)
}
