package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.sql.DriverManager
import java.util.Base64

import graft.TestSpark
import graft.sinks.{DerbyDialect, JdbcCatalog}
import graft.sources.mqtt.{MiniMqttBroker, MqttConnectors, MqttSettings, TcpMqttConnector}
import org.scalatest.funsuite.AnyFunSuite

/** The assembled daemon ([[IngestDaemon.assemble]]) end-to-end over the
  * full wire path the production main uses: a real-TCP in-process MQTT
  * broker, a scripted-HTTP Consul backend feeding the topic watch, and
  * an embedded Derby warehouse standing in for ClickHouse — publish →
  * subscribe-per-consul → parse → route → JDBC rows, a mid-run Consul
  * topic swap, the poison side output, and the graceful-stop order.
  * Plus the CLI surface itself: Go-flag parsing (main.go:39-46) and the
  * reference's TLS config file shape (config.go:17-21). */
class IngestDaemonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def await(cond: => Boolean, ms: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(20)
    }
    cond
  }

  private def kvBody(json: String, modifyIndex: Long): String = {
    val b64 = Base64.getEncoder.encodeToString(json.getBytes(UTF_8))
    s"""[{"Key":"mqttClient/topics","Value":"$b64",""" +
      s""""ModifyIndex":$modifyIndex}]"""
  }

  test("flag parsing mirrors the reference CLI (main.go:39-46)") {
    val cfg = IngestDaemon.parse(Array(
      "-enableTLS=false", "-username", "u", "-password", "p",
      "-broker", "mqtt.example", "-port", "1883",
      "-consulHost", "consul.example:8501",
      "-DBHost", "jdbc:clickhouse://ch:8123/default",
      "--clientId", "c1", "-rejectedDir", "/tmp/rej"))
    assert(!cfg.enableTls)
    assert(cfg.username.contains("u") && cfg.password.contains("p"))
    assert(cfg.broker == "mqtt.example" && cfg.port == 1883)
    assert(cfg.consulHost == "consul.example:8501")
    assert(cfg.dbHost == "jdbc:clickhouse://ch:8123/default")
    assert(cfg.clientId == "c1" && cfg.rejectedDir.contains("/tmp/rej"))

    // defaults match the reference's flag defaults
    val d = IngestDaemon.parse(Array.empty)
    assert(d.enableTls && d.port == 8883)
    // bare bool flag means true (Go rule)
    assert(IngestDaemon.parse(Array("-enableTLS")).enableTls)
    intercept[IllegalArgumentException] {
      IngestDaemon.parse(Array("-nonsense", "x"))
    }
    intercept[IllegalArgumentException] {
      IngestDaemon.parse(Array("-port")) // missing value
    }
  }

  test("TLS config file shape + scheme rule (config.go:17-21)") {
    val tls = IngestDaemon.parseTlsFile(
      """{"caPath": "/etc/ca.pem", "certPath": "/etc/c.pem",
        |  "keyPath": "/etc/k.pem"}""".stripMargin)
    assert(tls.caCertPath == "/etc/ca.pem")
    assert(tls.clientCertPath == "/etc/c.pem")
    assert(tls.clientKeyPath == "/etc/k.pem")

    // TLS paths are only read when enabled AND port selects ssl —
    // non-8883 ports never touch the config file (client.go:92-98)
    val plain = IngestDaemon.mqttSettings(IngestDaemon.Config(
      broker = "h", port = 1883, tlsConfig = "/does/not/exist"))
    assert(plain.tls.isEmpty && plain.scheme == "tcp")

    val consul = IngestDaemon.consulBackend("c.example:8501")
    assert(consul != null)
    intercept[IllegalArgumentException] {
      IngestDaemon.consulBackend("a:b:c")
    }
  }

  test("assembled daemon e2e: broker + consul fake + Derby, swap, stop") {
    val broker = new MiniMqttBroker()
    val cid = s"daemon-${System.nanoTime()}"
    val conn = new TcpMqttConnector(MqttSettings(
      host = "127.0.0.1", port = broker.port, clientId = cid,
      keepAliveSecs = 5, reconnectDelayMillis = 50L)).connect()
    val connectorName = s"daemon-spec-$cid"
    MqttConnectors.register(connectorName, conn)

    @volatile var index = 1L
    @volatile var topicsJson = """{"sensors": "/plant/+/out/sensors/#"}"""
    val backend = new ConsulKvBackend("consul.fake", 8500, http = { _ =>
      ConsulKvBackend.Response(kvBody(topicsJson, index), Some(index))
    })

    val db = s"memory:daemon${System.nanoTime()}"
    DriverManager.getConnection(s"jdbc:derby:$db;create=true").close()
    val factory: () => java.sql.Connection = {
      val u = s"jdbc:derby:$db"
      () => DriverManager.getConnection(u)
    }
    val catalog = new JdbcCatalog(factory, DerbyDialect)

    val rej = Files.createTempDirectory("daemon-rej").toString
    val a = IngestDaemon.assemble(spark,
      IngestDaemon.Config(clientId = cid,
        checkpointDir = Files.createTempDirectory("daemon-ckpt").toString,
        rejectedDir = Some(rej), pollMillis = 20L),
      conn, connectorName, backend, catalog)
    try {
      // startup read subscribed the consul topic set
      assert(await(conn.isConfigured(cid)), "daemon never subscribed")
      assert(a.watcher.topics == Map("sensors" -> "/plant/+/out/sensors/#"))

      assert(await(broker.publish("/plant/p1/out/sensors/temp",
        """{"value":21.5}""") == 1))
      assert(await(broker.publish("/plant/p1/out/sensors/temp",
        """{"value":22.5}""") == 1))
      // poison: bool value is neither Float64 nor String (F4)
      assert(await(broker.publish("/plant/p1/out/sensors/bad",
        """{"value":true}""") == 1))
      assert(await(conn.latestSeq(cid) >= 3L))
      a.query.processAllAvailable()

      val c = DriverManager.getConnection(s"jdbc:derby:$db")
      try {
        val rs = c.createStatement()
          .executeQuery("""SELECT COUNT(*) FROM "temp"""")
        rs.next()
        assert(rs.getInt(1) == 2, "good rows must land in the warehouse")
      } finally c.close()
      val rejected = spark.read.parquet(rej).collect()
      assert(rejected.length == 1 &&
        rejected(0).getAs[String]("topic").endsWith("/bad"),
        "poison message must land in the rejected side output")

      // ---- consul swap: ModifyIndex advances → resubscribe
      topicsJson = """{"alerts": "/alerts/#"}"""
      index = 2L
      assert(await(a.watcher.topics == Map("alerts" -> "/alerts/#")),
        "watcher never picked up the consul change")
      // once the new filter routes, the old unsubscribe has been
      // processed (same session, in-order packets)
      assert(await(broker.publish("/alerts/x/y/z/fire",
        """{"value":"ALARM"}""") == 1))
      assert(broker.publish("/plant/p1/out/sensors/temp",
        """{"value":9.9}""") == 0, "old topic must be unsubscribed")
      assert(await(conn.latestSeq(cid) >= 4L))
      a.query.processAllAvailable()

      val c2 = DriverManager.getConnection(s"jdbc:derby:$db")
      try {
        val rs = c2.createStatement()
          .executeQuery("""SELECT "value" FROM "fire"""")
        rs.next()
        assert(rs.getString(1) == "ALARM")
        val rs2 = c2.createStatement()
          .executeQuery("""SELECT COUNT(*) FROM "temp"""")
        rs2.next()
        assert(rs2.getInt(1) == 2, "nothing routed after unsubscribe")
      } finally c2.close()

      // ---- graceful stop: watcher, then query (QuitChannel analog)
      a.stop()
      assert(!a.query.isActive, "stop() must terminate the query")
    } finally {
      if (a.query.isActive) a.query.stop()
      conn.close()
      broker.close()
    }
  }
}
