package graft.sources.mqtt

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import MqttCodec._

/** Property fuzz over the hand-rolled MQTT 3.1.1 wire codec: arbitrary
  * topics (full UTF-8, incl. multi-byte), payload sizes spanning all
  * remaining-length varint widths, and the full packet-id range must
  * round-trip bit-exact — a codec bug here silently corrupts the ingest
  * feed (fixed seed; generators sampled directly, same convention as
  * IngestPropertySpec). */
class MqttCodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(1337L))

  private val topicGen: Gen[String] = for {
    n <- Gen.choose(0, 6)
    segs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("+"), Gen.const("#"),
      Gen.const("датчик"), Gen.const("温度")))  // multi-byte UTF-8
  } yield "/" + segs.mkString("/")

  private val packetIdGen = Gen.choose(1, 0xFFFF)

  test("publish round-trips arbitrary topics, payloads, ids (200 cases)") {
    val gen = for {
      topic <- topicGen
      qos <- Gen.oneOf(0, 1)
      pid <- packetIdGen
      // sizes crossing the 1-byte (127) and 2-byte (16383) varint edges
      size <- Gen.oneOf(Gen.choose(0, 130), Gen.choose(16380, 16390))
      body <- Gen.listOfN(size, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield Publish(topic, body.toArray, qos,
      packetId = if (qos > 0) pid else 0)
    sample(gen, 200).foreach { p =>
      val back = read(new ByteArrayInputStream(encode(p)))
        .asInstanceOf[Publish]
      assert(back.topic == p.topic, s"topic for $p")
      assert(back.qos == p.qos && back.packetId == p.packetId)
      assert(back.payload.toSeq == p.payload.toSeq,
        s"payload (${p.payload.length} bytes) for topic ${p.topic}")
    }
  }

  test("subscribe/unsubscribe round-trip arbitrary filter lists (100 cases)") {
    val subGen = for {
      pid <- packetIdGen
      n <- Gen.choose(1, 8)
      filters <- Gen.listOfN(n, topicGen)
      qos <- Gen.listOfN(n, Gen.oneOf(0, 1))
    } yield Subscribe(pid, filters.zip(qos))
    sample(subGen, 100).foreach { p =>
      assert(read(new ByteArrayInputStream(encode(p))) == p)
      val u = Unsubscribe(p.packetId, p.topics.map(_._1))
      assert(read(new ByteArrayInputStream(encode(u))) == u)
    }
  }

  test("connect round-trips credential combinations (100 cases)") {
    val gen = for {
      cid <- Gen.alphaNumStr.map(_.take(23)) // MQTT 3.1.1 client-id cap
      user <- Gen.option(Gen.alphaNumStr.map(_.take(10)))
      pass <- Gen.option(Gen.alphaNumStr.map("p" + _.take(10)))
      keep <- Gen.choose(0, 0xFFFF)
      clean <- Gen.oneOf(true, false)
    } yield Connect(cid, user, pass, keep, clean)
    sample(gen, 100).foreach { p =>
      assert(read(new ByteArrayInputStream(encode(p))) == p)
    }
  }

  test("utf-8 string length is BYTES not chars (wire-format trap)") {
    val topic = "/датчик/温度" // 2-byte and 3-byte UTF-8 sequences
    val p = Publish(topic, "x".getBytes(UTF_8), qos = 1, packetId = 9)
    val bytes = encode(p)
    val back = read(new ByteArrayInputStream(bytes)).asInstanceOf[Publish]
    assert(back.topic == topic)
    // the encoded topic-length prefix must count UTF-8 bytes
    val utf8Len = topic.getBytes(UTF_8).length
    assert(utf8Len != topic.length) // the trap exists on this input
  }
}
