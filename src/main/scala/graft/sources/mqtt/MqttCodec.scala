package graft.sources.mqtt

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal MQTT 3.1.1 (protocol level 4) wire codec — exactly the packet
  * subset the engine's client needs: CONNECT/CONNACK, SUBSCRIBE/SUBACK,
  * UNSUBSCRIBE/UNSUBACK, PUBLISH (QoS 0/1) + PUBACK, PINGREQ/PINGRESP,
  * DISCONNECT.
  *
  * The reference delegates all of this to paho
  * (/root/reference/client/client.go:117-123 Connect, :126-137 Subscribe
  * at QoS 1, :140-148 Unsubscribe, :151-158 Publish at QoS 0); no MQTT
  * library ships in this build, so the engine carries its own spec-level
  * implementation (OASIS MQTT 3.1.1, sections 2-3: fixed header with
  * 7-bit-varint Remaining Length, big-endian uint16s, length-prefixed
  * UTF-8 strings). Pure bytes-in/bytes-out — no sockets here — so every
  * packet shape is unit-testable.
  */
object MqttCodec {

  sealed trait Packet
  final case class Connect(clientId: String, username: Option[String],
      password: Option[String], keepAliveSecs: Int,
      cleanSession: Boolean) extends Packet
  final case class ConnAck(sessionPresent: Boolean, returnCode: Int) extends Packet
  final case class Publish(topic: String, payload: Array[Byte], qos: Int,
      packetId: Int = 0, dup: Boolean = false, retain: Boolean = false) extends Packet
  final case class PubAck(packetId: Int) extends Packet
  final case class Subscribe(packetId: Int, topics: Seq[(String, Int)]) extends Packet
  final case class SubAck(packetId: Int, returnCodes: Seq[Int]) extends Packet
  final case class Unsubscribe(packetId: Int, topics: Seq[String]) extends Packet
  final case class UnsubAck(packetId: Int) extends Packet
  case object PingReq extends Packet
  case object PingResp extends Packet
  case object Disconnect extends Packet

  // ---------------------------------------------------------- encoding

  def encode(p: Packet): Array[Byte] = p match {
    case c: Connect =>
      val body = new ByteArrayOutputStream()
      writeString(body, "MQTT")          // protocol name
      body.write(4)                      // protocol level 4 = 3.1.1
      var flags = 0
      if (c.cleanSession) flags |= 0x02
      if (c.username.isDefined) flags |= 0x80
      if (c.password.isDefined) flags |= 0x40
      body.write(flags)
      writeU16(body, c.keepAliveSecs)
      writeString(body, c.clientId)
      c.username.foreach(writeString(body, _))
      c.password.foreach(writeString(body, _))
      frame(0x10, body.toByteArray)
    case ConnAck(sp, rc) =>
      frame(0x20, Array[Byte](if (sp) 1 else 0, rc.toByte))
    case pub: Publish =>
      val body = new ByteArrayOutputStream()
      writeString(body, pub.topic)
      if (pub.qos > 0) writeU16(body, pub.packetId)
      body.write(pub.payload)
      val h = 0x30 | (if (pub.dup) 0x08 else 0) | (pub.qos << 1) |
        (if (pub.retain) 0x01 else 0)
      frame(h, body.toByteArray)
    case PubAck(id) => frame(0x40, u16(id))
    case Subscribe(id, topics) =>
      val body = new ByteArrayOutputStream()
      writeU16(body, id)
      topics.foreach { case (t, qos) => writeString(body, t); body.write(qos) }
      frame(0x82, body.toByteArray) // reserved flags 0010 mandatory
    case SubAck(id, codes) =>
      val body = new ByteArrayOutputStream()
      writeU16(body, id)
      codes.foreach(body.write)
      frame(0x90, body.toByteArray)
    case Unsubscribe(id, topics) =>
      val body = new ByteArrayOutputStream()
      writeU16(body, id)
      topics.foreach(writeString(body, _))
      frame(0xA2, body.toByteArray) // reserved flags 0010 mandatory
    case UnsubAck(id) => frame(0xB0, u16(id))
    case PingReq => frame(0xC0, Array.emptyByteArray)
    case PingResp => frame(0xD0, Array.emptyByteArray)
    case Disconnect => frame(0xE0, Array.emptyByteArray)
  }

  private def frame(header: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 5)
    out.write(header)
    writeVarLen(out, body.length)
    out.write(body)
    out.toByteArray
  }

  /** Remaining Length: 7 bits per byte, MSB = continuation (spec §2.2.3). */
  private def writeVarLen(out: OutputStream, n0: Int): Unit = {
    var n = n0
    do {
      var digit = n % 128
      n /= 128
      if (n > 0) digit |= 0x80
      out.write(digit)
    } while (n > 0)
  }

  private def u16(v: Int): Array[Byte] =
    Array[Byte]((v >> 8).toByte, (v & 0xff).toByte)
  private def writeU16(out: OutputStream, v: Int): Unit = out.write(u16(v), 0, 2)
  private def writeString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeU16(out, b.length)
    out.write(b, 0, b.length)
  }

  // ---------------------------------------------------------- decoding

  /** Blocking read of one packet from the stream; throws [[EOFException]]
    * on orderly close mid-boundary. */
  def read(in: InputStream): Packet = {
    val h = in.read()
    if (h < 0) throw new EOFException("connection closed")
    val len = readVarLen(in)
    val body = readFully(in, len)
    decode(h, body)
  }

  private def readVarLen(in: InputStream): Int = {
    var mult = 1; var value = 0; var i = 0
    while (i < 4) {
      val d = in.read()
      if (d < 0) throw new EOFException("connection closed in length")
      value += (d & 0x7f) * mult
      if ((d & 0x80) == 0) return value
      mult *= 128
      i += 1
    }
    throw new IllegalStateException("malformed remaining length")
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException("connection closed in body")
      off += r
    }
    buf
  }

  private[mqtt] def decode(header: Int, body: Array[Byte]): Packet = {
    def u16At(i: Int): Int = ((body(i) & 0xff) << 8) | (body(i + 1) & 0xff)
    def stringAt(i: Int): (String, Int) = {
      val n = u16At(i)
      (new String(body, i + 2, n, UTF_8), i + 2 + n)
    }
    (header >> 4) match {
      case 1 => // CONNECT (server side — used by the test broker)
        val (_, afterName) = stringAt(0)
        // afterName: protocol level (1 byte), then flags, then keepalive
        val flags = body(afterName + 1) & 0xff
        val keepAlive = u16At(afterName + 2)
        val (clientId, afterCid) = stringAt(afterName + 4)
        var pos = afterCid
        val user = if ((flags & 0x80) != 0) {
          val (u, p) = stringAt(pos); pos = p; Some(u)
        } else None
        val pass = if ((flags & 0x40) != 0) {
          val (w, p) = stringAt(pos); pos = p; Some(w)
        } else None
        Connect(clientId, user, pass, keepAlive, (flags & 0x02) != 0)
      case 2 => ConnAck((body(0) & 0x01) != 0, body(1) & 0xff)
      case 3 =>
        val qos = (header >> 1) & 0x03
        val (topic, afterTopic) = stringAt(0)
        val (pid, payloadStart) =
          if (qos > 0) (u16At(afterTopic), afterTopic + 2)
          else (0, afterTopic)
        Publish(topic, body.slice(payloadStart, body.length), qos, pid,
          dup = (header & 0x08) != 0, retain = (header & 0x01) != 0)
      case 4 => PubAck(u16At(0))
      case 8 =>
        val pid = u16At(0)
        var pos = 2
        val topics = Seq.newBuilder[(String, Int)]
        while (pos < body.length) {
          val (t, p) = stringAt(pos)
          topics += ((t, body(p) & 0xff))
          pos = p + 1
        }
        Subscribe(pid, topics.result())
      case 9 => SubAck(u16At(0), body.drop(2).map(_ & 0xff).toSeq)
      case 10 =>
        val pid = u16At(0)
        var pos = 2
        val topics = Seq.newBuilder[String]
        while (pos < body.length) {
          val (t, p) = stringAt(pos)
          topics += t
          pos = p
        }
        Unsubscribe(pid, topics.result())
      case 11 => UnsubAck(u16At(0))
      case 12 => PingReq
      case 13 => PingResp
      case 14 => Disconnect
      case t => throw new IllegalStateException(s"unsupported packet type $t")
    }
  }
}
