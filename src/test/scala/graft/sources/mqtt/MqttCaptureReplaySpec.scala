package graft.sources.mqtt

import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Session-capture replay: the last interop check on X3
  * (client/client.go:126-137). [[MqttGoldenFramesSpec]] pins single
  * FRAMES against the OASIS tables; this spec pins a whole SESSION —
  * the byte stream a mosquitto 2.x broker and a paho-style client
  * exchange across connect → subscribe → deliver(QoS 1) → deliver
  * (QoS 0), hand-transcribed frame-by-frame from the OASIS 3.1.1 spec
  * (§3.1/§3.2/§3.3/§3.4/§3.8/§3.9) the way `mosquitto_sub -v -d`
  * logs it. Neither direction goes through [[MqttCodec]] on the
  * server side:
  *
  *  - the fake broker WRITES pre-transcribed raw bytes (never
  *    `encode`), so a decoder misreading shared with the encoder
  *    cannot self-confirm;
  *  - it CAPTURES every byte the client sends and the test compares
  *    the full client→broker capture against the pre-transcribed
  *    expectation, so the connector's outbound framing — including
  *    the paho-isms the reference inherits (packet ids allocated
  *    from 1; PUBACK sent only after the message is buffered; clean
  *    session + 30 s keep-alive defaults, client.go:86-111) — is
  *    checked as a stream, not frame-by-frame.
  */
class MqttCaptureReplaySpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---------------------------------------------------------------
  // client→broker transcript (what a paho client sends, in order)
  // ---------------------------------------------------------------

  // §3.1 CONNECT: proto "MQTT" level 4, flags 0x02 (clean session),
  // keep-alive 30 s (paho default, mirrored by MqttSettings), client
  // id "graft1". Remaining length 10 + 8 = 18.
  private val capConnect = bytes(
    0x10, 0x12,
    0x00, 0x04, 'M', 'Q', 'T', 'T',
    0x04, 0x02, 0x00, 0x1E,
    0x00, 0x06, 'g', 'r', 'a', 'f', 't', '1')

  // §3.8 SUBSCRIBE: paho allocates packet ids from 1, one filter
  // "sensors/#" at QoS 1 (at-least-once, client.go:132). Fixed header
  // 0x82 (reserved bits 0010 mandatory). Remaining 2 + 2 + 9 + 1 = 14.
  private val capSubscribe = bytes(
    0x82, 0x0E, 0x00, 0x01,
    0x00, 0x09, 's', 'e', 'n', 's', 'o', 'r', 's', '/', '#',
    0x01)

  // §3.4 PUBACK for the broker's QoS-1 delivery below (pid 1).
  private val capPubAck = bytes(0x40, 0x02, 0x00, 0x01)

  private val expectedClientStream = capConnect ++ capSubscribe ++ capPubAck

  // ---------------------------------------------------------------
  // broker→client transcript (played back verbatim, never encode())
  // ---------------------------------------------------------------

  // §3.2 CONNACK: session-present 0 (clean session), rc 0.
  private val playConnAck = bytes(0x20, 0x02, 0x00, 0x00)

  // §3.9 SUBACK pid 1, granted QoS 1.
  private val playSubAck = bytes(0x90, 0x03, 0x00, 0x01, 0x01)

  // §3.3 PUBLISH QoS 1 (0x32), topic "sensors/t1" (10 bytes), pid 1
  // AFTER the topic, payload {"v":1} (7 bytes). Remaining
  // 2 + 10 + 2 + 7 = 21.
  private val playPublishQos1 = bytes(
    0x32, 0x15,
    0x00, 0x0A, 's', 'e', 'n', 's', 'o', 'r', 's', '/', 't', '1',
    0x00, 0x01,
    '{', '"', 'v', '"', ':', '1', '}')

  // §3.3 PUBLISH QoS 0 (0x30): NO packet id. Topic "sensors/t2",
  // payload {"v":2}. Remaining 2 + 10 + 7 = 19.
  private val playPublishQos0 = bytes(
    0x30, 0x13,
    0x00, 0x0A, 's', 'e', 'n', 's', 'o', 'r', 's', '/', 't', '2',
    '{', '"', 'v', '"', ':', '2', '}')

  private def await(cond: => Boolean, ms: Long = 5000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(10)
    }
    cond
  }

  test("connector replays a transcribed mosquitto session byte-for-byte") {
    val server = new ServerSocket(0, 1, InetAddress.getByName("127.0.0.1"))
    val captured = new ArrayBuffer[Byte]()
    @volatile var serverErr: Option[Throwable] = None
    val broker = new Thread(() => {
      try {
        val s = server.accept()
        val in = s.getInputStream
        val out = s.getOutputStream
        def capturedLen = captured.synchronized(captured.length)
        // continuous capture of everything the client writes
        val pump = new Thread(() => {
          try {
            val b = new Array[Byte](4096)
            var n = in.read(b)
            while (n >= 0) {
              captured.synchronized { captured ++= b.take(n) }
              n = in.read(b)
            }
          } catch { case _: Exception => () }
        })
        pump.setDaemon(true)
        pump.start()
        // script: each broker frame goes out only after the client
        // bytes that precede it in a real session have arrived
        require(await(capturedLen >= capConnect.length), "no CONNECT")
        out.write(playConnAck); out.flush()
        require(await(
          capturedLen >= capConnect.length + capSubscribe.length),
          "no SUBSCRIBE")
        out.write(playSubAck); out.flush()
        out.write(playPublishQos1); out.flush()
        require(await(capturedLen >= expectedClientStream.length),
          "no PUBACK")
        out.write(playPublishQos0); out.flush()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    broker.setDaemon(true)
    broker.start()

    val conn = new TcpMqttConnector(MqttSettings(
      host = "127.0.0.1", port = server.getLocalPort,
      clientId = "graft1")).connect()
    try {
      conn.setSubscriptions("graft1", Seq("sensors/#"))
      // both deliveries (QoS 1 then QoS 0) land in the buffer in order
      assert(await(conn.latestSeq("graft1") >= 2L),
        "expected 2 buffered messages")
      val msgs = conn.fetch("graft1", 0L, 2L)
      assert(msgs.map(_.topic) == Seq("sensors/t1", "sensors/t2"))
      assert(msgs.map(_.payload) == Seq("""{"v":1}""", """{"v":2}"""))
      // the client's outbound stream must equal the transcription —
      // snapshot before close() (which legitimately appends DISCONNECT)
      assert(await(captured.synchronized(captured.length) >=
        expectedClientStream.length))
      val sent = captured.synchronized(captured.toArray)
      assert(sent.sameElements(expectedClientStream),
        s"client stream ${sent.map(b => f"$b%02x").mkString(" ")} != " +
          expectedClientStream.map(b => f"$b%02x").mkString(" "))
      assert(serverErr.isEmpty, s"broker script failed: $serverErr")
    } finally {
      conn.close()
      server.close()
    }
  }
}
