package graft.streaming

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.Base64

/** Where the dynamic topic map comes from (SURVEY.md §2.1 S3).
  *
  * The reference reads Consul KV `mqttClient/topics` via a blocking query:
  * `LoadTopics()` parks on the KV endpoint with the last seen index and
  * returns `(map, changed, err)` where `changed` means the `ModifyIndex`
  * advanced (/root/reference/config/config.go:72-96, change test at
  * :90-93). This trait is that exact contract minus the Go error return;
  * a backend MAY block inside [[load]] (Consul's long poll) or return
  * immediately (file poll) — the watcher loop treats both the same.
  */
trait ConfigBackend {
  /** One load cycle. Blocking is allowed; errors should throw (the
    * watcher logs and keeps the previous subscription set, unlike the
    * reference, which kills the process — main.go:99-102). */
  def load(): ConfigBackend.Load
}

object ConfigBackend {
  /** `topics` = the full current map; `changed` = backend-side change
    * detection (Consul: ModifyIndex advanced; file: content differs). */
  final case class Load(topics: Map[String, String], changed: Boolean)

  /** Flat `{"name": "topic", ...}` parser — the only shape the reference
    * stores (config.go:82-86; fixture client_test.go:186 `{"name":"test"}`). */
  def parseTopicMap(json: String): Map[String, String] = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    entry.findAllMatchIn(json)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
  }
  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}

/** File-backed topic map: same JSON shape, change detection by content
  * comparison (the `ModifyIndex` equivalent). Content, not mtime: two
  * writes inside one filesystem timestamp tick would make an mtime gate
  * serve stale config forever; the file is a small topic map, re-reading
  * per poll is cheap. */
final class FileConfigBackend(path: Path) extends ConfigBackend {
  private var last: Option[Map[String, String]] = None

  override def load(): ConfigBackend.Load = {
    val parsed = ConfigBackend.parseTopicMap(Files.readString(path))
    val changed = !last.contains(parsed)
    last = Some(parsed)
    ConfigBackend.Load(parsed, changed)
  }
}

/** Consul KV backend — the reference's actual control plane, re-expressed
  * over Consul's HTTP API with JDK-only plumbing:
  *
  *  - blocking query: `GET /v1/kv/<key>?index=<last>&wait=<w>s` parks
  *    server-side until `ModifyIndex` passes `<last>` or the wait
  *    expires (config.go:76-80's `QueryOptions{WaitIndex}`);
  *  - change detection: `changed = index != lastIndex`, then remember
  *    the new index (config.go:90-95) — the index is read from the
  *    `X-Consul-Index` response header, falling back to the body's
  *    `ModifyIndex`;
  *  - the KV `Value` arrives base64-encoded in a JSON array of one
  *    entry; decoded bytes are the `{"name": "topic"}` map
  *    (config.go:82-86).
  *
  * `http` is injectable so the protocol logic is testable offline; the
  * default uses `HttpURLConnection` and works against a real agent.
  */
final class ConsulKvBackend(
    host: String,
    port: Int = 8500,
    key: String = "mqttClient/topics", // config.go:13-14
    waitSeconds: Int = 60,
    http: String => ConsulKvBackend.Response = ConsulKvBackend.httpGet)
    extends ConfigBackend {

  private var lastIndex = 0L

  override def load(): ConfigBackend.Load = {
    val url =
      s"http://$host:$port/v1/kv/$key?index=$lastIndex&wait=${waitSeconds}s"
    val resp = http(url)
    val index = resp.consulIndex
      .orElse(extractLong(resp.body, "ModifyIndex"))
      .getOrElse(0L)
    val changed = index != lastIndex // config.go:90-93
    lastIndex = index
    val topics = extractValue(resp.body)
      .map(b64 => ConfigBackend.parseTopicMap(
        new String(Base64.getDecoder.decode(b64), UTF_8)))
      .getOrElse(Map.empty)
    ConfigBackend.Load(topics, changed)
  }

  private def extractLong(body: String, field: String): Option[Long] =
    ("\"" + field + "\"\\s*:\\s*(\\d+)").r
      .findFirstMatchIn(body).map(_.group(1).toLong)
  private def extractValue(body: String): Option[String] =
    """"Value"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
}

object ConsulKvBackend {
  final case class Response(body: String, consulIndex: Option[Long])

  /** Real HTTP GET (used against a live Consul agent). The read timeout
    * must exceed the blocking-query wait, or every long poll would abort
    * early as a timeout. */
  def httpGet(url: String): Response = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(10 * 60 * 1000)
    try {
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      val idx = Option(conn.getHeaderField("X-Consul-Index"))
        .flatMap(s => scala.util.Try(s.toLong).toOption)
      Response(body, idx)
    } finally conn.disconnect()
  }
}
