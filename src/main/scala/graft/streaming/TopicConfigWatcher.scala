package graft.streaming

import graft.sources.mqtt.{InMemoryBroker, MqttConnector}
import java.nio.file.Path
import java.util.concurrent.atomic.AtomicBoolean

/** S3 — the dynamic-topic control plane (SURVEY.md §2.1 S3, §3.3).
  *
  * The reference long-polls Consul KV `mqttClient/topics` for a JSON
  * object of `name → topic-filter` strings and resubscribes on every
  * `ModifyIndex` advance (/root/reference/config/config.go:72-101,
  * main.go:97-108). The watcher loop here is backend-agnostic: any
  * [[ConfigBackend]] ([[FileConfigBackend]] for offline runs,
  * [[ConsulKvBackend]] for the reference's actual control plane) feeds
  * the same apply path, and the subscription swap goes through the
  * [[MqttConnector]] seam — taking effect at the next micro-batch
  * boundary, closing the reference's unsubscribe→subscribe loss window.
  *
  * Unlike the reference (a watch error kills the whole process,
  * main.go:99-102), errors are logged and the previous subscription set
  * stays active.
  */
final class TopicConfigWatcher(backend: ConfigBackend, clientId: String,
    pollMillis: Long = 200L,
    connector: MqttConnector = InMemoryBroker,
    /** Shard count of the source this watcher feeds — a config change is
      * re-sharded with the same round-robin the source used, so each
      * shard session's subscription set swaps consistently. (For TCP
      * scale-out each shard is its own registered connector; this single-
      * connector path shards sessions within one backend.) */
    connectors: Int = 1) {

  /** File-backed convenience constructor (the shape round-1 callers use). */
  def this(path: Path, clientId: String, pollMillis: Long) =
    this(new FileConfigBackend(path), clientId, pollMillis, InMemoryBroker)

  private val running = new AtomicBoolean(false)
  @volatile private var current: Map[String, String] = Map.empty
  private var thread: Thread = _

  def topics: Map[String, String] = current

  private def applyIfChanged(): Unit = {
    val loaded = backend.load()
    // the map comparison backstops a backend whose change flag is
    // coarser than the content (e.g. Consul index bump on a same-value
    // rewrite) — resubscribing is not free, so only do it on real change
    if (loaded.changed && loaded.topics != current) {
      current = loaded.topics
      val filters = loaded.topics.values.toSeq.sorted
      graft.sources.mqtt.MqttSource.shardIds(clientId, connectors)
        .zipWithIndex.foreach { case (sid, i) =>
          connector.setSubscriptions(sid, graft.sources.mqtt.MqttSource
            .shardFilters(filters, connectors, i))
        }
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
