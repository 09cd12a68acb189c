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

  test("-maxResidentRoots bounds the daemon's cluster state with " +
    "observable eviction") {
    val broker = new MiniMqttBroker()
    val cid = s"daemon-clusters-${System.nanoTime()}"
    val conn = new TcpMqttConnector(MqttSettings(
      host = "127.0.0.1", port = broker.port, clientId = cid,
      keepAliveSecs = 5, reconnectDelayMillis = 50L)).connect()
    val connectorName = s"daemon-spec-$cid"
    MqttConnectors.register(connectorName, conn)

    val backend = new ConsulKvBackend("consul.fake", 8500, http = { _ =>
      ConsulKvBackend.Response(
        kvBody("""{"sensors": "/plant/+/out/sensors/#"}""", 1L), Some(1L))
    })
    val db = s"memory:daemonclu${System.nanoTime()}"
    DriverManager.getConnection(s"jdbc:derby:$db;create=true").close()
    val catalog = new JdbcCatalog(
      { val u = s"jdbc:derby:$db"; () => DriverManager.getConnection(u) },
      DerbyDialect)

    // near-dup String payloads: one-word-tail variants of 24-token
    // templates (the StreamingClustersBoundedSpec shape — shingle
    // Jaccard ≈ 0.91, well over the 0.5 verify threshold)
    def variant(t: Int, v: Int): String =
      ((1 to 23).map(i => s"t${t}w$i") :+ s"v$v").mkString(" ")
    val topic = "/plant/p1/out/sensors/txt"
    def payload(text: String): String = s"""{"value":"$text"}"""
    // the fold keys docs on xxhash64(topic, payload) — compute the ids
    // the daemon will assign, to assert the cross-batch merge exactly
    def docId(text: String): Long = {
      import org.apache.spark.sql.functions.{lit, xxhash64}
      spark.range(1)
        .select(xxhash64(lit(topic), lit(payload(text)))).head().getLong(0)
    }

    // -maxResidentRoots implies -dedupClusters (parse rule) — build the
    // Config exactly as the CLI would
    val cfg = IngestDaemon.parse(Array(
      "-broker", "127.0.0.1", "-maxResidentRoots", "6",
      "-clustersCheckpointDir",
      Files.createTempDirectory("daemon-clu-ckpt").toString))
      .copy(clientId = cid,
        checkpointDir = Files.createTempDirectory("daemon-ckpt").toString,
        pollMillis = 20L)
    assert(cfg.dedupClusters && cfg.maxResidentRoots == 6)

    val a = IngestDaemon.assemble(spark, cfg, conn, connectorName,
      backend, catalog)
    try {
      assert(await(conn.isConfigured(cid)), "daemon never subscribed")
      val st = a.clusters.getOrElse(fail("bounded daemon must expose " +
        "the clusters gauge"))

      // batch 1: four variants of template 0 — one 4-member cluster
      val batchA = (1 to 4).map(v => variant(0, v))
      batchA.foreach(t => assert(await(broker.publish(topic, payload(t)) == 1)))
      assert(await(conn.latestSeq(cid) >= 4L))
      a.query.processAllAvailable()
      assert(await(st.metrics.residentRoots == 4),
        s"expected the 4-endpoint cluster resident, got ${st.metrics}")
      assert(st.metrics.spillAppends == 0L)

      // batch 2: four variants of template 1 — resident would be 8 > 6,
      // so the quiescent template-0 cluster must spill
      val batchB = (1 to 4).map(v => variant(1, v))
      batchB.foreach(t => assert(await(broker.publish(topic, payload(t)) == 1)))
      assert(await(conn.latestSeq(cid) >= 8L))
      a.query.processAllAvailable()
      assert(await(st.metrics.spillAppends >= 4L),
        s"cold cluster must spill past the cap, got ${st.metrics}")
      assert(st.metrics.residentRoots <= 6,
        s"resident must respect -maxResidentRoots, got ${st.metrics}")

      // batch 3: revisit template 0 — a COLD (fully spilled) cluster;
      // the fold must fault its entries back in and merge exactly
      val revisit = variant(0, 9)
      assert(await(broker.publish(topic, payload(revisit)) == 1))
      assert(await(conn.latestSeq(cid) >= 9L))
      a.query.processAllAvailable()
      val expectRoot = (batchA.map(docId) :+ docId(revisit)).min
      assert(await(st.get.label(docId(revisit)) == expectRoot),
        s"cross-batch merge through the spill log: expected " +
          s"$expectRoot, got ${st.get.label(docId(revisit))}")

      // the stage must not break the warehouse route
      val c = DriverManager.getConnection(s"jdbc:derby:$db")
      try {
        val rs = c.createStatement()
          .executeQuery("""SELECT COUNT(*) FROM "txt"""")
        rs.next()
        assert(rs.getInt(1) == 9, "all String records still routed")
      } finally c.close()

      a.stop()
      assert(!a.query.isActive)
    } finally {
      if (a.query.isActive) a.query.stop()
      conn.close()
      broker.close()
    }
  }
}
