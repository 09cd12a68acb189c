package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Consul blocking-query protocol against a scripted HTTP fake — the
  * exact LoadTopics contract (config.go:72-96): index-carrying GET,
  * ModifyIndex-based change detection, base64 KV value decode. */
class ConsulKvBackendSpec extends AnyFunSuite {

  private def kvBody(json: String, modifyIndex: Long): String = {
    val b64 = Base64.getEncoder.encodeToString(json.getBytes(UTF_8))
    s"""[{"LockIndex":0,"Key":"mqttClient/topics","Flags":0,""" +
      s""""Value":"$b64","CreateIndex":7,"ModifyIndex":$modifyIndex}]"""
  }

  test("first load is a change; unchanged index is not (config.go:90-93)") {
    val urls = scala.collection.mutable.ListBuffer.empty[String]
    var index = 10L
    var value = """{"sensors": "/a/#"}"""
    val backend = new ConsulKvBackend("consul.local", 8500,
      http = { url =>
        urls += url
        ConsulKvBackend.Response(kvBody(value, index), Some(index))
      })

    val first = backend.load()
    assert(first.changed && first.topics == Map("sensors" -> "/a/#"))
    // blocking query carries the last seen index (WaitIndex semantics)
    assert(urls.head.contains("index=0"))

    val second = backend.load()
    assert(!second.changed) // index did not advance
    assert(urls(1).contains("index=10"))

    index = 11L
    value = """{"alerts": "/b/#"}"""
    val third = backend.load()
    assert(third.changed && third.topics == Map("alerts" -> "/b/#"))
    assert(urls(2).contains("index=10")) // parked on the previous index
  }

  test("falls back to body ModifyIndex when the header is missing") {
    var calls = 0
    val backend = new ConsulKvBackend("h", 8500, http = { _ =>
      calls += 1
      ConsulKvBackend.Response(kvBody("""{"n": "/t/#"}""", 42L), None)
    })
    assert(backend.load().changed)
    assert(!backend.load().changed) // 42 remembered from the body
    assert(calls == 2)
  }

  test("watcher loop drives subscriptions from the Consul backend") {
    val cid = s"consul-${System.nanoTime()}"
    graft.sources.mqtt.InMemoryBroker.reset(cid)
    @volatile var index = 1L
    @volatile var value = """{"sensors": "/a/#"}"""
    val backend = new ConsulKvBackend("h", 8500, http = { _ =>
      ConsulKvBackend.Response(kvBody(value, index), Some(index))
    })
    val w = new TopicConfigWatcher(backend, cid, pollMillis = 20L).start()
    try {
      assert(w.topics == Map("sensors" -> "/a/#"))
      index = 2L
      value = """{"alerts": "/b/#"}"""
      val deadline = System.currentTimeMillis() + 5000
      while (w.topics != Map("alerts" -> "/b/#") &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(w.topics == Map("alerts" -> "/b/#"))
      // the swap reached the connector seam
      assert(graft.sources.mqtt.InMemoryBroker.isConfigured(cid))
    } finally w.stop()
  }
}
