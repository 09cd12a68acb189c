package graft.streaming

import graft.sources.mqtt.MqttSource
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicBoolean

/** S3 — the dynamic-topic control plane (SURVEY.md §2.1 S3, §3.3).
  *
  * The reference long-polls Consul KV `mqttClient/topics` for a JSON
  * object of `name → topic-filter` strings and resubscribes on every
  * `ModifyIndex` advance (/root/reference/config/config.go:72-101,
  * main.go:97-108). No Consul client ships offline, so the engine watches
  * a file of the same JSON shape (/root/reference/client/client_test.go:186
  * fixture: `{"name": "test"}`) by mtime and applies the diff through
  * [[MqttSource.reconfigure]] — which takes effect at the next micro-batch
  * boundary, closing the reference's unsubscribe→subscribe loss window.
  *
  * Unlike the reference (a watch error kills the whole process,
  * main.go:99-102), errors are logged and the previous subscription set
  * stays active.
  */
final class TopicConfigWatcher(path: Path, clientId: String,
    pollMillis: Long = 200L) {

  private val running = new AtomicBoolean(false)
  @volatile private var current: Map[String, String] = Map.empty
  private var thread: Thread = _

  /** Flat `{"name": "topic", ...}` parser — the only shape the reference
    * stores (config.go:82-86). */
  private[streaming] def parseTopicMap(json: String): Map[String, String] = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    entry.findAllMatchIn(json)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
  }
  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  def topics: Map[String, String] = current

  private def applyIfChanged(): Unit = {
    // content comparison, not mtime: two writes inside one filesystem
    // timestamp tick would make an mtime gate serve stale config forever;
    // the file is a small topic map, re-reading per poll is cheap
    val parsed = parseTopicMap(Files.readString(path))
    if (parsed != current) {
      current = parsed
      MqttSource.reconfigure(clientId, parsed.values.toSeq.sorted)
    }
  }

  def start(): TopicConfigWatcher = {
    applyIfChanged() // initial load, like the reference's startup read
    running.set(true)
    thread = new Thread(() => {
      while (running.get()) {
        try applyIfChanged()
        catch { case e: Exception =>
          System.err.println(s"[topic-watch] ${e.getMessage}")
        }
        Thread.sleep(pollMillis)
      }
    }, s"topic-watch-$clientId")
    thread.setDaemon(true)
    thread.start()
    this
  }

  def stop(): Unit = {
    running.set(false)
    if (thread != null) thread.join(2000)
  }
}
