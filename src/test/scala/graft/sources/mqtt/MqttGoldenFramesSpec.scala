package graft.sources.mqtt

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import MqttCodec._

/** Golden MQTT 3.1.1 frames derived BYTE-BY-BYTE from the OASIS spec
  * (mqtt-v3.1.1-os), NOT from this repo's encoder — breaking the
  * "both sides of the wire are this codec" symmetry the round-5 review
  * flagged: a shared misreading of the spec (remaining-length rules,
  * QoS-1 packet-id placement, reserved flag bits) would round-trip
  * cleanly through encode∘decode yet fail against any real broker.
  * Every expected array below was written out from the spec's tables
  * (§2.2 fixed header, §2.2.3 remaining length, §3.1 CONNECT, §3.2
  * CONNACK, §3.3 PUBLISH, §3.4 PUBACK, §3.8 SUBSCRIBE, §3.9 SUBACK),
  * the same frames a paho/mosquitto capture would contain.
  */
class MqttGoldenFramesSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // §3.1: CONNECT, clientId "paho1", clean session, keep-alive 60 s.
  // Fixed header 0x10, remaining = 10 (variable header) + 7 (payload).
  // Variable header: len-prefixed "MQTT", level 0x04, flags 0x02
  // (clean session only), keep-alive 0x003C.
  private val goldenConnect = bytes(
    0x10, 0x11,
    0x00, 0x04, 'M', 'Q', 'T', 'T',
    0x04, 0x02, 0x00, 0x3C,
    0x00, 0x05, 'p', 'a', 'h', 'o', '1')

  // §3.2: CONNACK, session-present 0, return code 0 (accepted).
  private val goldenConnAck = bytes(0x20, 0x02, 0x00, 0x00)

  // §3.8: SUBSCRIBE packet-id 10, one filter "a/b" at QoS 1. Fixed
  // header MUST be 0x82 (type 8, reserved bits 0010).
  private val goldenSubscribe = bytes(
    0x82, 0x08, 0x00, 0x0A, 0x00, 0x03, 'a', '/', 'b', 0x01)

  // §3.9: SUBACK packet-id 10, granted QoS 1.
  private val goldenSubAck = bytes(0x90, 0x03, 0x00, 0x0A, 0x01)

  // §3.3: PUBLISH QoS 1 (header 0x32), topic "a/b", packet-id 5 AFTER
  // the topic, then the raw payload "hello" (no length prefix).
  private val goldenPublishQos1 = bytes(
    0x32, 0x0C, 0x00, 0x03, 'a', '/', 'b', 0x00, 0x05,
    'h', 'e', 'l', 'l', 'o')

  // §3.3: QoS 0 PUBLISH carries NO packet id at all.
  private val goldenPublishQos0 = bytes(
    0x30, 0x0A, 0x00, 0x03, 'a', '/', 'b', 'h', 'e', 'l', 'l', 'o')

  // §3.4: PUBACK for packet-id 5.
  private val goldenPubAck = bytes(0x40, 0x02, 0x00, 0x05)

  test("encoder emits the spec's exact bytes") {
    assert(encode(Connect("paho1", None, None, cleanSession = true,
      keepAliveSecs = 60)).sameElements(goldenConnect))
    assert(encode(ConnAck(sessionPresent = false, returnCode = 0))
      .sameElements(goldenConnAck))
    assert(encode(Subscribe(10, Seq("a/b" -> 1)))
      .sameElements(goldenSubscribe))
    assert(encode(SubAck(10, Seq(1))).sameElements(goldenSubAck))
    assert(encode(Publish("a/b", "hello".getBytes(UTF_8), qos = 1,
      packetId = 5, dup = false, retain = false))
      .sameElements(goldenPublishQos1))
    assert(encode(Publish("a/b", "hello".getBytes(UTF_8), qos = 0,
      packetId = 0, dup = false, retain = false))
      .sameElements(goldenPublishQos0))
    assert(encode(PubAck(5)).sameElements(goldenPubAck))
  }

  test("decoder accepts a broker-order golden byte stream") {
    // the frames a real session interleaves, concatenated as they'd
    // appear on the socket: CONNACK, SUBACK, then two inbound PUBLISHes
    val wire = goldenConnAck ++ goldenSubAck ++ goldenPublishQos1 ++
      goldenPublishQos0
    val in = new ByteArrayInputStream(wire)
    assert(read(in) == ConnAck(sessionPresent = false, returnCode = 0))
    assert(read(in) == SubAck(10, Seq(1)))
    read(in) match {
      case p: Publish =>
        assert(p.topic == "a/b" && p.qos == 1 && p.packetId == 5 &&
          new String(p.payload, UTF_8) == "hello")
      case other => fail(s"expected PUBLISH, got $other")
    }
    read(in) match {
      case p: Publish =>
        assert(p.topic == "a/b" && p.qos == 0 &&
          new String(p.payload, UTF_8) == "hello")
      case other => fail(s"expected PUBLISH, got $other")
    }
    assert(in.read() == -1, "no trailing bytes consumed or left over")
  }

  test("remaining length uses the spec's §2.2.3 varint encoding") {
    // spec example: 321 encodes as 0xC1 0x02 (321 = 65 + 2·128).
    // topic "t" costs 3 body bytes; payload 318 → body 321.
    val p = Publish("t", Array.fill[Byte](318)(0x5A), qos = 0,
      packetId = 0, dup = false, retain = false)
    val enc = encode(p)
    assert((enc(0) & 0xff) == 0x30)
    assert((enc(1) & 0xff) == 0xC1 && (enc(2) & 0xff) == 0x02,
      f"remaining-length bytes were ${enc(1)}%02x ${enc(2)}%02x")
    assert(enc.length == 3 + 321)
    // and the boundary cases the spec tabulates: 127 is one byte,
    // 128 is 0x80 0x01, 16383 is 0xFF 0x7F, 16384 is 0x80 0x80 0x01
    def remLen(bodyLen: Int): Seq[Int] = {
      val e = encode(Publish("t", Array.fill[Byte](bodyLen - 3)(1),
        qos = 0, packetId = 0, dup = false, retain = false))
      e.drop(1).take(e.length - 1 - bodyLen).map(_ & 0xff).toSeq
    }
    assert(remLen(127) == Seq(0x7F))
    assert(remLen(128) == Seq(0x80, 0x01))
    assert(remLen(16383) == Seq(0xFF, 0x7F))
    assert(remLen(16384) == Seq(0x80, 0x80, 0x01))
  }
}
