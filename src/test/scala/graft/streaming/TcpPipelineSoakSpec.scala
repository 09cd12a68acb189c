package graft.streaming

import graft.TestSpark
import graft.registry.SchemaRegistry
import graft.sinks.{ManifestCatalog, TableRouter}
import graft.sources.mqtt.{MiniMqttBroker, MqttConnectors, MqttSettings, TcpMqttConnector}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Network-path composition soak: the FULL ingest pipeline (DataSourceV2
  * source → F1–F5 parse → router → ManifestCatalog warehouse) running
  * over a REAL TCP MQTT session, with a mid-stream broker-side
  * connection drop. [[IngestSoakSpec]] soaks the pipeline at volume on
  * the in-memory connector; [[graft.sources.mqtt.TcpMqttConnectorSpec]]
  * proves the connector survives an outage in isolation; this spec
  * composes the two: the auto-reconnect + resubscribe recovery happens
  * UNDER a live StreamingQuery and not a message committed before the
  * drop is lost or duplicated in the warehouse afterwards.
  */
class TcpPipelineSoakSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def await(cond: => Boolean, ms: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(20)
    }
    cond
  }

  test("pipeline over TCP survives a broker connection drop, effectively-once") {
    val broker = new MiniMqttBroker()
    val cid = s"tcpsoak-${System.nanoTime()}"
    val conn = new TcpMqttConnector(MqttSettings(
      host = "127.0.0.1", port = broker.port, clientId = cid,
      keepAliveSecs = 2, reconnectDelayMillis = 50L)).connect()
    val connectorName = s"tcp-soak-$cid"
    MqttConnectors.register(connectorName, conn)
    val wh = Files.createTempDirectory("tcpsoak-wh").toString
    val catalog = new ManifestCatalog(spark, wh, checkpointInterval = 5)
    val source = spark.readStream.format("mqtt")
      .option("connector", connectorName)
      .option("clientId", cid)
      .option("topics", "/tcp/+/out/sensors/#")
      .load()
    val q = IngestPipeline.start(source,
      new TableRouter(new SchemaRegistry, catalog),
      Files.createTempDirectory("tcpsoak-ckpt").toString)
    try {
      // the source configures the subscription at first batch planning;
      // publishes before that would have no subscriber — wait for it
      q.processAllAvailable()
      assert(await(conn.isConfigured(cid)), "source never subscribed")

      var seq = 0L
      def publishWave(n: Int): Unit = {
        val before = conn.latestSeq(cid)
        (1 to n).foreach { i =>
          val t = if (i % 2 == 0) "a" else "b"
          // retry-until-routed: right after an outage the client's
          // resubscribe is fire-and-forget (no SUBACK await on the
          // reconnect path), so the broker may not have processed the
          // SUBSCRIBE yet; a publish returning 0 reached NO subscriber
          // and can be retried with the same payload without any
          // duplication risk
          assert(await(broker.publish(s"/tcp/dev/out/sensors/$t",
            s"""{"value":$seq}""") == 1),
            s"message $seq never found a subscriber")
          seq += 1
        }
        // TCP delivery is async: all n must land in the connector
        // buffer before the micro-batch drains it
        assert(await(conn.latestSeq(cid) >= before + n),
          s"only ${conn.latestSeq(cid) - before} of $n arrived")
        q.processAllAvailable()
      }

      publishWave(2000)

      // ---- broker-side outage: sever without DISCONNECT; the client
      // must reconnect AND resubscribe on its own, under the live query
      broker.dropAllConnections()
      assert(await(broker.activeSessions == 1), "no reconnect session")
      assert(broker.connectCount.get() >= 2, "expected a re-CONNECT")

      publishWave(2000)
      assert(q.isActive, "query must survive the outage")

      // effectively-once end-to-end: every published value exactly once
      for (t <- Seq("a", "b")) {
        val r = catalog.read(t)
          .selectExpr("count(*)", "count(DISTINCT value)").head()
        assert(r.getLong(0) == 2000L,
          s"table $t: expected 2000 rows, got ${r.getLong(0)}")
        assert(r.getLong(1) == 2000L,
          s"table $t: ${r.getLong(0) - r.getLong(1)} duplicates")
      }
    } finally {
      q.stop()
      conn.close()
      broker.close()
    }
  }
}
