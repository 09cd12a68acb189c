package graft.sources.mqtt

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import MqttCodec._

/** The real-network MQTT path: wire codec, connection settings (scheme /
  * TLS validation mirroring /root/reference/client/client_test.go:46-77),
  * and a live TCP round-trip against [[MiniMqttBroker]] incl. QoS-1
  * acks, subscription swap, auth, and auto-reconnect. */
class TcpMqttConnectorSpec extends AnyFunSuite {

  private def await(cond: => Boolean, ms: Long = 5000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(20)
    }
    cond
  }

  private def settings(port: Int, cid: String = "spec") = MqttSettings(
    host = "127.0.0.1", port = port, clientId = cid,
    keepAliveSecs = 2, reconnectDelayMillis = 50L)

  // --------------------------------------------------------- codec

  test("codec round-trips every packet type") {
    val packets: Seq[Packet] = Seq(
      Connect("cid-1", Some("user"), Some("pass"), 30, cleanSession = true),
      Connect("cid-2", None, None, 0, cleanSession = false),
      ConnAck(sessionPresent = true, returnCode = 0),
      ConnAck(sessionPresent = false, returnCode = 4),
      Publish("/a/b", "hello".getBytes(UTF_8), qos = 0),
      Publish("/a/b", "x".getBytes(UTF_8), qos = 1, packetId = 77),
      PubAck(77),
      Subscribe(5, Seq("/a/+/c" -> 1, "/d/#" -> 0)),
      SubAck(5, Seq(1, 0)),
      Unsubscribe(6, Seq("/a/+/c", "/d/#")),
      UnsubAck(6),
      PingReq, PingResp, Disconnect)
    packets.foreach { p =>
      val decoded = read(new ByteArrayInputStream(encode(p)))
      (p, decoded) match {
        case (a: Publish, b: Publish) =>
          assert(a.topic == b.topic && a.qos == b.qos &&
            a.packetId == b.packetId &&
            a.payload.toSeq == b.payload.toSeq)
        case (a, b) => assert(a == b, s"round-trip mismatch for $p")
      }
    }
  }

  test("remaining-length varint survives payloads beyond one length byte") {
    val big = Publish("/t", Array.fill[Byte](100000)(42), qos = 1, packetId = 1)
    val back = read(new ByteArrayInputStream(encode(big))).asInstanceOf[Publish]
    assert(back.payload.length == 100000 && back.payload.forall(_ == 42))
  }

  // ------------------------------------------ settings (client_test.go)

  test("broker url scheme: ssl iff port 8883 (client_test.go:73-77)") {
    assert(settings(1883).brokerUrl == "tcp://127.0.0.1:1883")
    assert(MqttSettings("h", 8883, "c",
      tls = Some(TlsSettings("ca", "crt", "key"))).brokerUrl == "ssl://h:8883")
    assert(MqttSettings("h", 1884, "c").scheme == "tcp")
  }

  test("invalid host/port rejected (client.go:87-90)") {
    intercept[IllegalArgumentException](MqttSettings("", 1883, "c"))
    intercept[IllegalArgumentException](MqttSettings("h", 0, "c"))
    intercept[IllegalArgumentException](MqttSettings("h", -1, "c"))
  }

  test("TLS path matrix: each missing path is an error (client.go:57-62)") {
    intercept[IllegalArgumentException](TlsSettings("", "crt", "key"))
    intercept[IllegalArgumentException](TlsSettings("ca", "", "key"))
    intercept[IllegalArgumentException](TlsSettings("ca", "crt", ""))
    assert(!TlsSettings("ca", "crt", "key").insecureSkipVerify) // fixed default
  }

  test("option plumbing builds TLS settings only for the ssl scheme") {
    val opts = Map("host" -> "broker", "port" -> "8883",
      "tlsCaCert" -> "/ca.pem", "tlsClientCert" -> "/crt.pem",
      "tlsClientKey" -> "/key.pem", "username" -> "u", "password" -> "p")
    val s = MqttSettings.fromOptions(opts.get)
    assert(s.useTls && s.tls.exists(_.caCertPath == "/ca.pem"))
    assert(s.username.contains("u") && s.password.contains("p"))
    val plain = MqttSettings.fromOptions(
      Map("host" -> "broker", "port" -> "1883").get)
    assert(!plain.useTls && plain.tls.isEmpty)
  }

  // ------------------------------------------------- live TCP sessions

  test("connect, subscribe, receive broker publishes in order, PUBACK QoS-1") {
    val broker = new MiniMqttBroker()
    try {
      val c = new TcpMqttConnector(settings(broker.port, "rt")).connect()
      try {
        c.setSubscriptions("rt", Seq("/c1/+/out/sensors/#"))
        broker.publish("/c1/d1/out/sensors/temp", """{"value":1}""")
        broker.publish("/other/x/y/z/w", """{"value":9}""") // not subscribed
        broker.publish("/c1/d2/out/sensors/hum", """{"value":2}""")
        assert(await(c.latestSeq("rt") == 2))
        val msgs = c.fetch("rt", 0, 2)
        assert(msgs.map(_.topic) == Seq("/c1/d1/out/sensors/temp",
          "/c1/d2/out/sensors/hum"))
        assert(msgs.map(_.payload) == Seq("""{"value":1}""", """{"value":2}"""))
        // QoS-1 deliveries must be PUBACK'd back to the broker
        assert(await(broker.pubAcksReceived.get() == 2))
        // truncate drops the committed prefix
        c.truncate("rt", 2)
        assert(c.fetch("rt", 0, 2).isEmpty && c.latestSeq("rt") == 2)
      } finally c.close()
    } finally broker.close()
  }

  test("subscription swap: unsubscribe-all then subscribe-all (client.go:126-148)") {
    val broker = new MiniMqttBroker()
    try {
      val c = new TcpMqttConnector(settings(broker.port, "swap")).connect()
      try {
        c.setSubscriptions("swap", Seq("/a/#"))
        broker.publish("/a/1", "first")
        assert(await(c.latestSeq("swap") == 1))
        c.setSubscriptions("swap", Seq("/b/#")) // swap
        broker.publish("/a/2", "stale-topic")
        broker.publish("/b/1", "new-topic")
        assert(await(c.latestSeq("swap") == 2))
        Thread.sleep(100) // give a wrong delivery time to arrive
        val topics = c.fetch("swap", 0, c.latestSeq("swap")).map(_.topic)
        assert(topics == Seq("/a/1", "/b/1"))
        assert(c.isConfigured("swap"))
      } finally c.close()
    } finally broker.close()
  }

  test("credentials ride the CONNECT packet; bad auth is refused rc=4") {
    val broker = new MiniMqttBroker(requireAuth = Some(("sensor", "secret")))
    try {
      val good = new TcpMqttConnector(settings(broker.port, "auth")
        .copy(username = Some("sensor"), password = Some("secret"))).connect()
      try assert(broker.lastCredentials.get() == (Some("sensor"), Some("secret")))
      finally good.close()
      intercept[IllegalStateException] {
        new TcpMqttConnector(settings(broker.port, "bad")
          .copy(username = Some("sensor"), password = Some("wrong"))).connect()
      }
    } finally broker.close()
  }

  test("auto-reconnect after connection loss resubscribes and resumes") {
    val broker = new MiniMqttBroker()
    try {
      val c = new TcpMqttConnector(settings(broker.port, "rec")).connect()
      try {
        c.setSubscriptions("rec", Seq("/s/#"))
        broker.publish("/s/1", "before")
        assert(await(c.latestSeq("rec") == 1))
        broker.dropAllConnections() // network partition / broker restart
        // client must reconnect AND resubscribe on its own
        assert(await(broker.connectCount.get() >= 2))
        assert(await(broker.activeSessions == 1))
        assert(await(broker.publish("/s/2", "after") == 1))
        assert(await(c.latestSeq("rec") == 2))
        assert(c.fetch("rec", 1, 2).head.payload == "after")
      } finally c.close()
    } finally broker.close()
  }

  test("DataSourceV2 source streams from the TCP connector (registry path)") {
    val spark = graft.TestSpark.spark
    val broker = new MiniMqttBroker()
    try {
      val c = new TcpMqttConnector(settings(broker.port, "e2e")).connect()
      try {
        MqttConnectors.register("spec-tcp", c)
        val q = spark.readStream.format("mqtt")
          .option("connector", "spec-tcp")
          .option("clientId", "e2e")
          .option("topics", "/net/#")
          .load()
          .writeStream.format("memory").queryName("tcp_e2e")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("ckpt").toString)
          .start()
        try {
          assert(await(broker.publish("/net/d1/a/b/temp", """{"value":3}""") == 1))
          assert(await(c.latestSeq("e2e") >= 1))
          q.processAllAvailable()
          val rows = spark.table("tcp_e2e").select("topic", "payload")
            .collect().map(r => (r.getString(0), r.getString(1)))
          assert(rows.toSeq == Seq(("/net/d1/a/b/temp", """{"value":3}""")))
        } finally q.stop()
      } finally c.close()
    } finally broker.close()
  }
}
