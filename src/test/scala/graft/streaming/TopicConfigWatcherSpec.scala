package graft.streaming

import graft.TestSpark
import graft.sources.mqtt.InMemoryBroker
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class TopicConfigWatcherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parses the reference's flat topic-map JSON") {
    import ConfigBackend.parseTopicMap
    assert(parseTopicMap("""{"name": "test"}""") == Map("name" -> "test"))
    assert(parseTopicMap(
      """{"a": "/x/#", "b": "/y/+/z"}""") ==
      Map("a" -> "/x/#", "b" -> "/y/+/z"))
    assert(parseTopicMap("{}") == Map.empty)
    assert(parseTopicMap("""{"q\"uo": "v\\al"}""") ==
      Map("q\"uo" -> "v\\al"))
  }

  test("config change swaps a live query's subscriptions") {
    val cid = s"cfg-${System.nanoTime()}"
    InMemoryBroker.reset(cid)
    val cfg = Files.createTempFile("topics", ".json")
    Files.writeString(cfg, """{"sensors": "/a/#"}""")
    val watcher = new TopicConfigWatcher(cfg, cid, pollMillis = 50L).start()
    val name = s"t${cid.replace("-", "")}"
    val q = spark.readStream.format("mqtt")
      .option("clientId", cid).option("topics", "/a/#").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("ck").toString)
      .start()
    try {
      InMemoryBroker.publish("/a/1/2/3/s", "m1")
      q.processAllAvailable()
      // update the file → watcher must resubscribe within a few polls
      Files.writeString(cfg, """{"alerts": "/b/#"}""")
      val deadline = System.currentTimeMillis() + 5000
      while (watcher.topics != Map("alerts" -> "/b/#") &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(watcher.topics == Map("alerts" -> "/b/#"))
      InMemoryBroker.publish("/a/1/2/3/s", "m2") // no longer subscribed
      InMemoryBroker.publish("/b/1/2/3/s", "m3")
      q.processAllAvailable()
      val got = spark.table(name).select("payload")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("m1", "m3"))
    } finally { q.stop(); watcher.stop() }
  }

  test("config change re-shards filters across a sharded source's sessions") {
    import graft.sources.mqtt.MqttSource
    val cid = s"cfgsh-${System.nanoTime()}"
    MqttSource.shardIds(cid, 2).foreach(InMemoryBroker.reset)
    val cfg = Files.createTempFile("topics", ".json")
    Files.writeString(cfg, """{"s0": "/a/#", "s1": "/b/#"}""")
    val watcher = new TopicConfigWatcher(new FileConfigBackend(cfg), cid,
      pollMillis = 50L, connectors = 2).start()
    val name = s"t${cid.replace("-", "")}"
    val q = spark.readStream.format("mqtt")
      .option("clientId", cid).option("topics", "/a/#,/b/#")
      .option("connectors", "2").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("ck").toString)
      .start()
    try {
      InMemoryBroker.publish("/a/1/2/3/s", "m1") // shard 0
      InMemoryBroker.publish("/b/1/2/3/s", "m2") // shard 1
      q.processAllAvailable()
      // swap BOTH shards' filter sets through the watcher
      Files.writeString(cfg, """{"s0": "/c/#", "s1": "/d/#"}""")
      val want = Map("s0" -> "/c/#", "s1" -> "/d/#")
      val deadline = System.currentTimeMillis() + 5000
      while (watcher.topics != want &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(watcher.topics == want)
      InMemoryBroker.publish("/a/1/2/3/s", "stale0")
      InMemoryBroker.publish("/b/1/2/3/s", "stale1")
      InMemoryBroker.publish("/c/1/2/3/s", "m3") // new shard-0 filter
      InMemoryBroker.publish("/d/1/2/3/s", "m4") // new shard-1 filter
      q.processAllAvailable()
      val got = spark.table(name).select("payload")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("m1", "m2", "m3", "m4"))
    } finally { q.stop(); watcher.stop() }
  }
}
