package graft.sources.mqtt

/** Broker connection settings (SURVEY.md §2.1 X3): URL scheme selection,
  * credentials, and the TLS material paths, with the same validation
  * surface the reference exposes:
  *
  *  - scheme is `ssl` iff port == 8883, else `tcp`
  *    (/root/reference/client/client.go:86-99); empty host or
  *    non-positive port is rejected (client.go:87-90);
  *  - TLS requires all three of CA cert / client cert / client key
  *    (client.go:57-62 — each missing path is its own error);
  *  - username/password ride along as plain options
  *    (SignIn, client.go:103-106).
  *
  * Deviation (documented, SURVEY.md §4.3 #7): the reference sets
  * `InsecureSkipVerify: true` inside its TLS config (client.go:65),
  * silently disabling server-certificate verification. Here verification
  * is ON unless `tlsInsecureSkipVerify` is explicitly set — the
  * strict-compat escape hatch is opt-in, not default.
  */
final case class MqttSettings(
    host: String,
    port: Int,
    clientId: String,
    username: Option[String] = None,
    password: Option[String] = None,
    keepAliveSecs: Int = 30,
    cleanSession: Boolean = true,
    subscribeQos: Int = 1, // at-least-once, client.go:132
    tls: Option[TlsSettings] = None,
    /** reconnect backoff start; doubles up to 30× per attempt cap */
    reconnectDelayMillis: Long = 200L) {
  require(host.nonEmpty && port > 0,
    s"invalid broker settings: host='$host' port=$port") // client.go:87-90

  /** `ssl://…` iff port 8883, else `tcp://…` — client.go:92-98. */
  def brokerUrl: String = s"$scheme://$host:$port"
  def scheme: String = if (port == 8883) "ssl" else "tcp"
  def useTls: Boolean = scheme == "ssl"
}

/** CA + client cert/key paths — all three mandatory when TLS is on
  * (client.go:57-62). */
final case class TlsSettings(
    caCertPath: String,
    clientCertPath: String,
    clientKeyPath: String,
    insecureSkipVerify: Boolean = false) {
  require(caCertPath.nonEmpty, "CA cert path not set")        // client.go:57-58
  require(clientCertPath.nonEmpty, "client cert path not set") // client.go:59-60
  require(clientKeyPath.nonEmpty, "client key path not set")   // client.go:61-62
}

object MqttSettings {
  /** Source-option plumbing: `spark.readStream.format("mqtt")
    * .option("host", …).option("port", …)…` → settings. TLS paths are
    * read only when the port selects the ssl scheme (mirrors the
    * reference wiring, main.go:57-66). */
  def fromOptions(get: String => Option[String]): MqttSettings = {
    val host = get("host").getOrElse("")
    val port = get("port").map(_.toInt).getOrElse(1883)
    val tls =
      if (port == 8883) Some(TlsSettings(
        caCertPath = get("tlsCaCert").getOrElse(""),
        clientCertPath = get("tlsClientCert").getOrElse(""),
        clientKeyPath = get("tlsClientKey").getOrElse(""),
        insecureSkipVerify =
          get("tlsInsecureSkipVerify").exists(_.toBoolean)))
      else None
    MqttSettings(
      host = host,
      port = port,
      clientId = get("clientId").getOrElse("graft"),
      username = get("username").filter(_.nonEmpty),
      password = get("password").filter(_.nonEmpty),
      keepAliveSecs = get("keepAliveSecs").map(_.toInt).getOrElse(30),
      cleanSession = get("cleanSession").forall(_.toBoolean),
      tls = tls)
  }
}
