package graft.streaming

import graft.TestSpark
import graft.registry.SchemaRegistry
import graft.sinks.{ManifestCatalog, TableRouter}
import graft.sources.mqtt.{InMemoryBroker, MqttSource}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Long-haul composition soak: every individually-spec'd pipeline
  * behavior exercised TOGETHER on one stream — 10⁶ messages through
  * the ManifestCatalog-backed warehouse across
  *
  *   publish waves → mid-stream topic reconfigure (S2's subscription
  *   swap at a batch boundary) → kill + publish-while-down + restart
  *   from checkpoint (X1 recovery) → compact + vacuum under traffic —
  *
  * asserting EFFECTIVELY-ONCE end-to-end: for every table, committed
  * row count == distinct payload count == exactly what was delivered
  * to the subscription, no loss, no duplicates. The manifest's
  * periodic checkpointing (checkpointInterval=5 over ~10 streaming
  * commits) and log reclamation are asserted via vacuum's removed-file
  * count. Runtime ~1-2 min on local[4]; this is the "compose the
  * pieces" soak the round-6 review asked for.
  */
class IngestSoakSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Waves = 10
  private val PerWave = 100000 // × 10 waves = 10⁶ messages
  private def topic(t: String) = s"/soak/dev/out/sensors/$t"

  test("1M-message soak: reconfigure + restart + vacuum, effectively-once") {
    val cid = s"soak-${System.nanoTime()}"
    // suite isolation: stopped clients from earlier suites subscribe
    // to '#' and would buffer all 10⁶ messages (and break the
    // unsubscribed-topic negative check below)
    InMemoryBroker.resetAll()
    val wh = Files.createTempDirectory("soak-wh").toString
    val ckpt = Files.createTempDirectory("soak-ckpt").toString
    // interval 5 so the periodic manifest checkpoint fires mid-soak
    val catalog = new ManifestCatalog(spark, wh, checkpointInterval = 5)
    val initialTopics = Seq(topic("a"), topic("b"))
    val allTopics = Seq(topic("a"), topic("b"), topic("c"))
    def newQuery(topics: Seq[String]) = IngestPipeline.start(
      IngestPipeline.mqttStream(spark, cid, topics),
      new TableRouter(new SchemaRegistry, catalog), ckpt)

    // one global sequence → every payload value is unique, so
    // count == count(DISTINCT value) detects any duplicate, and the
    // per-table expected tallies detect any loss
    var seq = 0L
    val expected = scala.collection.mutable.Map(
      "a" -> 0L, "b" -> 0L, "c" -> 0L)
    def publishWave(tables: Seq[String]): Unit = {
      var i = 0
      while (i < PerWave) {
        val t = tables(i % tables.size)
        val n = InMemoryBroker.publish(topic(t), s"""{"value":$seq}""")
        if (n > 0) expected(t) += 1L
        seq += 1
        i += 1
      }
    }

    var q = newQuery(initialTopics)
    try {
      // ---- waves 1-3: a+b subscribed; c publishes must NOT deliver
      // (checked per-client via the sequence counter — receiver counts
      // would also see unrelated clients)
      val seqBefore = InMemoryBroker.latestSeq(cid)
      InMemoryBroker.publish(topic("c"), """{"value":-1}""")
      assert(InMemoryBroker.latestSeq(cid) == seqBefore,
        "publish to an unsubscribed topic must not reach this client")
      (1 to 3).foreach { _ =>
        publishWave(Seq("a", "b"))
        q.processAllAvailable()
      }

      // ---- mid-stream reconfigure: add c (swap at batch boundary)
      MqttSource.reconfigure(cid, allTopics)
      (4 to 6).foreach { _ =>
        publishWave(Seq("a", "b", "c"))
        q.processAllAvailable()
      }

      // ---- kill; traffic continues while down; restart from ckpt
      q.stop()
      publishWave(Seq("a", "b", "c")) // wave 7, buffered by the broker
      q = newQuery(allTopics)
      (8 to Waves).foreach { _ =>
        publishWave(Seq("a", "b", "c"))
        q.processAllAvailable()
      }
      q.processAllAvailable() // drain wave 7 replay if not yet pulled
      assert(q.isActive, "query must survive the whole soak")

      // ---- layout maintenance under a live query: compact rewrites
      // table a, vacuum reclaims the dead pre-compaction files AND the
      // delta log folded into the periodic checkpoints
      catalog.compact("a")
      val removed = catalog.vacuum(retentionMs = 0L)
      assert(removed > 0,
        "vacuum should reclaim folded log deltas + compacted-away files")

      // ---- effectively-once, per table
      assert(seq == Waves.toLong * PerWave)
      assert(expected.values.sum == Waves.toLong * PerWave,
        "every published message should have had a receiver")
      for (t <- Seq("a", "b", "c")) {
        val df = catalog.read(t)
        val (n, nd) = {
          val r = df.selectExpr("count(*)", "count(DISTINCT value)").head()
          (r.getLong(0), r.getLong(1))
        }
        assert(n == expected(t),
          s"table $t: expected ${expected(t)} rows, got $n")
        assert(nd == n, s"table $t: ${n - nd} duplicate rows")
      }
    } finally {
      q.stop()
      InMemoryBroker.reset(cid)
    }
  }
}
