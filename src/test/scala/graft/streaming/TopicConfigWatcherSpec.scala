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
}
