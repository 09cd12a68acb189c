package graft.sources.mqtt

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** In-process MQTT broker stand-in.
  *
  * The reference talks to a real broker over paho
  * (/root/reference/client/client.go:126-137); no MQTT client library
  * ships in this offline environment, so the engine splits the seam:
  * everything Spark-side (DataSourceV2 offsets, micro-batch planning,
  * subscription swaps at batch boundaries) is real and tested against this
  * broker, and [[MqttConnector]] marks where a network client would plug
  * in unchanged.
  *
  * Semantics mirrored from the reference:
  *  - subscribe-all / unsubscribe-all as an atomic subscription swap
  *    (client.go:126-148) — but applied at micro-batch boundaries, closing
  *    the reference's message-loss window during reconfiguration
  *    (SURVEY.md §3.3);
  *  - at-least-once (QoS 1, client.go:132): `publish` enqueues to every
  *    matching subscriber; redelivery is simulated by publishing twice.
  */
trait MqttConnector {
  def setSubscriptions(clientId: String, topicFilters: Seq[String]): Unit
  /** Has this client EVER been configured (including an explicit
    * unsubscribe-all)? The source consults this on query (re)start to
    * avoid reverting a dynamic reconfigure with a stale topics option. */
  def isConfigured(clientId: String): Boolean
  def fetch(clientId: String, fromSeq: Long, untilSeq: Long): Seq[InMemoryBroker.Msg]
  def latestSeq(clientId: String): Long
  /** Drop messages below `uptoSeq` (exclusive) — called from the source's
    * `commit()` so the buffer stays bounded by uncommitted backlog. */
  def truncate(clientId: String, uptoSeq: Long): Unit
}

/** Connector registry: the `connector` source option picks the backend —
  * `memory` (default, [[InMemoryBroker]]), `tcp` (a [[TcpMqttConnector]]
  * built from the same option map), or any name registered up front
  * (tests inject live instances this way). One TCP connector per
  * (host, port, clientId) triple — a broker session is stateful. */
object MqttConnectors {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, MqttConnector]

  def register(name: String, c: MqttConnector): Unit = registry.put(name, c)

  def resolve(get: String => Option[String]): MqttConnector =
    get("connector").getOrElse("memory") match {
      case "memory" => InMemoryBroker
      case "tcp" =>
        val s = MqttSettings.fromOptions(get)
        registry.getOrElseUpdate(s"tcp:${s.host}:${s.port}:${s.clientId}",
          new TcpMqttConnector(s).connect())
      case name => registry.getOrElse(name,
        throw new IllegalArgumentException(s"unknown mqtt connector '$name'"))
    }
}

object InMemoryBroker extends MqttConnector {
  final case class Msg(topic: String, payload: String, tsMicros: Long)

  private final class ClientState {
    val buf = new ArrayBuffer[Msg]()
    /** absolute sequence number of buf(0) — advanced by [[truncate]] so
      * committed prefixes can be dropped (otherwise a long-running stream
      * accumulates every message ever published until OOM) */
    var base: Long = 0L
    @volatile var subs: Seq[String] = Nil
    /** set once subscriptions have ever been configured — an explicit
      * unsubscribe-all (subs == Nil) must NOT look "never configured",
      * or a query restart would revert to its stale topics option */
    @volatile var configured: Boolean = false
  }
  private val clients = TrieMap.empty[String, ClientState]
  // Deterministic logical clock: 2024-01-01T00:00:00Z epoch-µs, one
  // MILLISECOND per publish — Spark's event-time watermark is tracked at
  // ms granularity, so sub-ms steps would freeze watermarks forever.
  private val clock = new java.util.concurrent.atomic.AtomicLong(
    1704067200000000L)

  /** MQTT topic-filter match: `+` = one level, `#` = all remaining. */
  def matches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1)
    val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      if (f(i) == "#") return true
      if (i >= t.length) return false
      if (f(i) != "+" && f(i) != t(i)) return false
      i += 1
    }
    f.length == t.length
  }

  private def state(clientId: String): ClientState =
    clients.getOrElseUpdate(clientId, new ClientState)

  override def setSubscriptions(clientId: String, topicFilters: Seq[String]): Unit = {
    val s = state(clientId)
    s.subs = topicFilters
    s.configured = true
  }

  /** Has this client EVER been configured (including an explicit
    * unsubscribe-all)? Used by the source on query (re)start to avoid
    * reverting a dynamic reconfigure with the stale `topics` option. */
  override def isConfigured(clientId: String): Boolean =
    clients.get(clientId).exists(_.configured)

  /** Deliver to every client with a matching filter; returns receivers. */
  def publish(topic: String, payload: String): Int =
    publishAt(topic, payload, clock.addAndGet(1000L))

  /** Deliver with an explicit event timestamp (µs) — lets tests inject
    * late data (an event time behind the stream's watermark). */
  def publishAt(topic: String, payload: String, tsMicros: Long): Int = {
    var n = 0
    clients.values.foreach { c =>
      if (c.subs.exists(matches(_, topic))) {
        c.buf.synchronized { c.buf += Msg(topic, payload, tsMicros) }
        n += 1
      }
    }
    n
  }

  /** Current logical clock (µs) — for constructing relative late events. */
  def now(): Long = clock.get()

  override def fetch(clientId: String, fromSeq: Long, untilSeq: Long): Seq[Msg] = {
    val c = state(clientId)
    c.buf.synchronized {
      val from = math.max(fromSeq - c.base, 0L).toInt
      val until = math.max(untilSeq - c.base, 0L).toInt
      c.buf.slice(from, until).toSeq
    }
  }

  override def latestSeq(clientId: String): Long = {
    val c = state(clientId)
    c.buf.synchronized(c.base + c.buf.length)
  }

  /** Drop messages below `uptoSeq` (exclusive) — called from the source's
    * `commit()` so the buffer stays bounded by uncommitted backlog. */
  override def truncate(clientId: String, uptoSeq: Long): Unit = {
    val c = state(clientId)
    c.buf.synchronized {
      val drop = math.min(math.max(uptoSeq - c.base, 0L), c.buf.length.toLong)
      if (drop > 0) {
        c.buf.remove(0, drop.toInt)
        c.base += drop
      }
    }
  }

  /** Test hygiene: forget a client entirely. */
  def reset(clientId: String): Unit = clients.remove(clientId)

  /** Suite-level test hygiene: forget EVERY client. High-volume specs
    * (the 10⁶-message soak) call this so stopped earlier-suite clients
    * — whose `#` subscriptions would otherwise buffer every message
    * unboundedly — don't accumulate the traffic. Safe only because the
    * forked test JVM runs suites sequentially; never used by the
    * pipeline itself. */
  def resetAll(): Unit = clients.clear()
}
