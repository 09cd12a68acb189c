package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property armor for the ingest hot path. [[Ingest.parse]] detects the
  * "value" key's JSON type with raw-text regexes (so the number-vs-
  * string distinction survives `get_json_object`'s quote-stripping);
  * the reference does a real JSON parse + type switch
  * (message.go:64-125). This spec pins the relationship between the
  * two on randomized inputs, against an INDEPENDENT Jackson-based
  * model of the reference's exact semantics:
  *
  *  1. SOUNDNESS, on arbitrary hostile payloads (malformed JSON,
  *     nested objects shadowing "value", strings with escaped quotes
  *     embedding `"value":5`): every row the ENGINE accepts, the
  *     reference also accepts, with the identical
  *     (client, device, tableName, type, value) record. The engine
  *     may over-reject on hostile text (the documented safe failure,
  *     Ingest.scala KNOWN LIMIT) but may never emit a record the
  *     reference wouldn't, nor a differently-typed/valued one.
  *  2. COMPLETENESS, on the reference's actual domain — FLAT JSON
  *     objects with unescaped alphanumeric strings (message.go's
  *     payloads: `{"timestamp":..., "value":...}`): accept/reject and
  *     the full record match the reference decision EXACTLY.
  */
class IngestPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val mapper = new ObjectMapper

  // ---------------- reference model (message.go, independently) ------

  private case class RefRec(client: String, device: String,
      table: String, vType: String, vD: Option[Double], vS: Option[String])

  private def refParse(topic: String, payload: String): Option[RefRec] = {
    // checkTopic (message.go:38-47): leading '/' and >= 4 slashes
    if (!topic.startsWith("/") || topic.count(_ == '/') < 4) return None
    // getDataFromTopic (message.go:50-61): Go strings.Split keeps the
    // leading empty segment; client = parts[1], device = parts[2],
    // tableName = last
    val parts = topic.split("/", -1)
    val (client, device, table) = (parts(1), parts(2), parts.last)
    // getDataFromMessage (message.go:64-94): strict JSON object parse,
    // required key "value"
    val node =
      try mapper.readTree(payload)
      catch { case _: Exception => return None }
    if (node == null || !node.isObject || !node.has("value")) return None
    val v = node.get("value")
    // createColumnDesc type switch (message.go:97-125): Go json gives
    // float64 for every number, string for strings, all else error
    if (v.isNumber) Some(RefRec(client, device, table, "Float64",
      Some(v.asDouble), None))
    else if (v.isTextual) Some(RefRec(client, device, table, "String",
      None, Some(v.asText)))
    else None
  }

  // ---------------- generators --------------------------------------

  private val seg = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val validTopicGen = for {
    c <- seg; d <- seg; t <- seg
  } yield s"/$c/$d/out/sensors/$t"

  private val topicGen = Gen.frequency(
    6 -> validTopicGen,
    1 -> (for { c <- seg; d <- seg } yield s"/$c/$d/out/sensors"), // 4 slashes, still valid
    1 -> (for { c <- seg; d <- seg } yield s"$c/$d/out/sensors/x"), // no leading /
    1 -> seg.map(s => s"/$s/only"),                                 // too few
    1 -> validTopicGen.map(_ + "/"))                                // trailing empty seg

  private val alnumStr = Gen.choose(0, 8)
    .flatMap(n => Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const(' '))).map(_.mkString))

  // JSON scalar rendered into flat object text via Jackson (guaranteed
  // valid, properly escaped — the reference's domain)
  private sealed trait JV
  private case class JNum(v: Double) extends JV
  private case class JInt(v: Long) extends JV
  private case class JStr(v: String) extends JV
  private case object JBool extends JV
  private case object JNull extends JV

  private val jvGen: Gen[JV] = Gen.frequency(
    4 -> Gen.choose(-1e6, 1e6).map(JNum.apply),
    3 -> Gen.choose(-1000000L, 1000000L).map(JInt.apply),
    4 -> alnumStr.map(JStr.apply),
    1 -> Gen.const(JBool),
    1 -> Gen.const(JNull))

  private def renderFlat(fields: List[(String, JV)]): String = {
    val node = mapper.createObjectNode()
    fields.foreach {
      case (k, JNum(v))  => node.put(k, v)
      case (k, JInt(v))  => node.put(k, v)
      case (k, JStr(v))  => node.put(k, v)
      case (k, JBool)    => node.put(k, true)
      case (k, JNull)    => node.putNull(k)
    }
    mapper.writeValueAsString(node)
  }

  private val flatPayloadGen: Gen[String] = for {
    hasValue <- Gen.frequency(4 -> Gen.const(true), 1 -> Gen.const(false))
    v <- jvGen
    extras <- Gen.someOf(List("timestamp", "foo", "n")).map(_.toList)
    extraVs <- Gen.listOfN(extras.size, jvGen)
  } yield renderFlat(
    (if (hasValue) List("value" -> v) else Nil) ++ extras.zip(extraVs))

  private val hostilePayloadGen: Gen[String] = Gen.frequency(
    2 -> flatPayloadGen.map(_.dropRight(2)),                  // truncated JSON
    // nested numeric "value" shadows a top-level string one — the
    // documented KNOWN-LIMIT shape (engine may over-reject, soundly)
    2 -> Gen.const("""{"a":{"value":9},"value":"x"}"""),
    2 -> Gen.const("""{"a":{"value":"y"},"value":8}"""),
    // escaped quotes embedding value-shaped text inside a string
    2 -> Gen.const("""{"note":"say \"value\":5 ok","value":"s"}"""),
    1 -> Gen.const("""{"note":"say \"value\":\"t\" ok","value":7}"""),
    1 -> Gen.const("5"), 1 -> Gen.const("null"), 1 -> Gen.const("[1,2]"),
    1 -> Gen.const(""), 1 -> Gen.const("""{"value":}"""))

  private def rowsGen(payload: Gen[String]): Gen[List[(String, String)]] =
    Gen.choose(20, 40).flatMap(n =>
      Gen.listOfN(n, topicGen.flatMap(t => payload.map(p => (t, p)))))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---------------- engine evaluation -------------------------------

  private case class EngRow(topic: String, payload: String, valid: Boolean,
      client: String, device: String, table: String, vType: String,
      vD: Option[Double], vS: Option[String])

  private def engineParse(rows: List[(String, String)]): Seq[EngRow] = {
    import spark.implicits._
    Ingest.parse(rows.toDF("topic", "payload"))
      .select(col("topic"), col("payload"), col("valid"), col("client"),
        col("device"), col("tableName"), col("value_type"), col("value_d"),
        col("value_s"))
      .collect().toSeq.map { r =>
        EngRow(r.getString(0), r.getString(1), r.getBoolean(2),
          r.getString(3), r.getString(4), r.getString(5), r.getString(6),
          if (r.isNullAt(7)) None else Some(r.getDouble(7)),
          Option(r.getString(8)))
      }
  }

  private def assertSound(e: EngRow): Unit = if (e.valid) {
    val ref = refParse(e.topic, e.payload)
    assert(ref.isDefined,
      s"engine accepted a record the reference rejects: $e")
    val r = ref.get
    assert((e.client, e.device, e.table, e.vType) ==
      ((r.client, r.device, r.table, r.vType)) &&
      e.vD == r.vD && e.vS == r.vS,
      s"engine record differs from reference: engine=$e ref=$r")
  }

  test("soundness: engine-accepted rows match the reference bit-for-bit" +
      " even on hostile payloads") {
    for (seed <- 1L to 8L)
      engineParse(sample(rowsGen(hostilePayloadGen), seed))
        .foreach(assertSound)
  }

  test("completeness: on flat payloads the engine decision equals the" +
      " reference decision") {
    for (seed <- 101L to 108L) {
      engineParse(sample(rowsGen(flatPayloadGen), seed)).foreach { e =>
        assertSound(e)
        val ref = refParse(e.topic, e.payload)
        assert(e.valid == ref.isDefined,
          s"flat-domain decision mismatch (engine valid=${e.valid}," +
            s" ref=$ref): topic=${e.topic} payload=${e.payload}")
      }
    }
  }

  // ------- original focused properties (pre-dating the model check) --

  private def sampleN[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val segGen = Gen.alphaNumStr.map(_.take(8))
  private val rawTopicGen: Gen[String] = for {
    n <- Gen.choose(0, 7)
    segs <- Gen.listOfN(n, segGen)
    lead <- Gen.oneOf("", "/")
  } yield lead + segs.mkString("/")

  test("topicValid agrees with the reference model on 300 random topics") {
    import spark.implicits._
    val topics = sampleN(rawTopicGen, 300)
    val df = topics.map((_, "{}")).toDF("topic", "payload")
    val got = df.select(Ingest.topicValid(col("topic")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == topics.map(t =>
      t.startsWith("/") && t.count(_ == '/') >= 4))
  }

  test("numeric payload values round-trip through parse") {
    import spark.implicits._
    val vals = sampleN(Gen.chooseNum(-1e6, 1e6), 100)
    val rows = vals.map(v => ("/c/d/x/y/s", s"""{"value":$v}"""))
    val got = Ingest.records(rows.toDF("topic", "payload"))
      .select("value_d").collect().map(_.getDouble(0)).toSet
    assert(got == vals.map(v => s"$v".toDouble).toSet)
  }

  test("string payload values survive exactly (JSON-safe strings)") {
    import spark.implicits._
    val vals = sampleN(Gen.alphaNumStr.map(_.take(20)), 80).distinct
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (s"/c/d$i/x/y/s", s"""{"value":"$v"}""") }
    val got = Ingest.records(rows.toDF("topic", "payload"))
      .select("value_s").collect().map(_.getString(0)).toSet
    assert(got == vals.toSet)
  }

  test("minhash LSH symmetry: jaccard-identical docs always bucket together") {
    import graft.functions.MinHashSig
    val docs = sampleN(Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d")), 40)
      .map(_.mkString(" "))
    // same token sequence → same signature, regardless of surrounding rows
    docs.foreach { d =>
      val toks = d.split(" ")
      val s1 = MinHashSig.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
      val s2 = MinHashSig.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
      assert(s1.array.toSeq == s2.array.toSeq)
    }
  }
}
