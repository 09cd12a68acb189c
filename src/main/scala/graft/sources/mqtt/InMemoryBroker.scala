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
  def fetch(clientId: String, fromSeq: Long, untilSeq: Long): Seq[InMemoryBroker.Msg]
  def latestSeq(clientId: String): Long
}

object InMemoryBroker extends MqttConnector {
  final case class Msg(topic: String, payload: String, tsMicros: Long)

  private final class ClientState {
    val buf = new ArrayBuffer[Msg]()
    @volatile var subs: Seq[String] = Nil
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

  override def setSubscriptions(clientId: String, topicFilters: Seq[String]): Unit =
    state(clientId).subs = topicFilters

  /** Does the client already have an active subscription set? Used by the
    * source on query (re)start to avoid reverting a dynamic reconfigure
    * with the stale original `topics` option. */
  def hasSubscriptions(clientId: String): Boolean =
    clients.get(clientId).exists(_.subs.nonEmpty)

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
      c.buf.slice(fromSeq.toInt, untilSeq.toInt).toSeq
    }
  }

  override def latestSeq(clientId: String): Long = {
    val c = state(clientId)
    c.buf.synchronized(c.buf.length.toLong)
  }

  /** Test hygiene: forget a client entirely. */
  def reset(clientId: String): Unit = clients.remove(clientId)
}
