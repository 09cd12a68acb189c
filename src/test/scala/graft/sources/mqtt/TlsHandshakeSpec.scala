package graft.sources.mqtt

import java.net.ServerSocket
import java.nio.file.{Files, Path}
import javax.net.ssl.SSLServerSocket

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** REAL mutual-TLS handshake through [[TcpMqttConnector.sslContext]]:
  * an openssl-generated CA signs separate server and client keypairs;
  * the broker listens on an `SSLServerSocket` requiring client certs;
  * the connector loads PEM CA + PEM cert + PKCS#8 key — the exact
  * material the reference's SetTLSSettings consumes
  * (/root/reference/client/client.go:56-83) — and completes an MQTT
  * session over the encrypted channel. Also pins the security fix: an
  * UNTRUSTED server fails closed unless `insecureSkipVerify` (the
  * reference's always-on behavior, client.go:65) is explicitly opted
  * into. */
class TlsHandshakeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var dir: Path = _
  private def p(name: String): String = dir.resolve(name).toString

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-tls")
    def sh(cmd: String): Unit =
      assert(Process(Seq("bash", "-c", cmd)).!(ProcessLogger(_ => ())) == 0,
        s"command failed: $cmd")
    // CA
    sh(s"openssl req -x509 -newkey rsa:2048 -nodes -keyout ${p("ca.key")} " +
      s"-out ${p("ca.pem")} -days 2 -subj /CN=graft-test-ca")
    // server + client keypairs signed by the CA; keys in PKCS#8
    for (who <- Seq("server", "client")) {
      sh(s"openssl req -newkey rsa:2048 -nodes -keyout ${p(s"$who.key")} " +
        s"-out ${p(s"$who.csr")} -subj /CN=localhost")
      sh(s"openssl x509 -req -in ${p(s"$who.csr")} -CA ${p("ca.pem")} " +
        s"-CAkey ${p("ca.key")} -CAcreateserial -days 2 -out ${p(s"$who.pem")}")
      sh(s"openssl pkcs8 -topk8 -nocrypt -in ${p(s"$who.key")} " +
        s"-out ${p(s"$who.p8")}")
    }
    // an unrelated CA for the fail-closed test
    sh(s"openssl req -x509 -newkey rsa:2048 -nodes -keyout ${p("other.key")} " +
      s"-out ${p("other.pem")} -days 2 -subj /CN=unrelated-ca")
  }

  private def tlsBroker(): MiniMqttBroker = {
    // the same sslContext builder serves the broker side: key = server
    // pair, trust = CA (needClientAuth makes it MUTUAL TLS)
    val serverCtx = TcpMqttConnector.sslContext(
      TlsSettings(p("ca.pem"), p("server.pem"), p("server.p8")))
    new MiniMqttBroker(serverSocket = () => {
      val ss = serverCtx.getServerSocketFactory.createServerSocket(0)
        .asInstanceOf[SSLServerSocket]
      ss.setNeedClientAuth(true)
      ss.asInstanceOf[ServerSocket]
    })
  }

  private def settings(port: Int, ca: String, skipVerify: Boolean = false) =
    MqttSettings(host = "127.0.0.1", port = port, clientId = "tls-spec",
      keepAliveSecs = 2, reconnectDelayMillis = 50L,
      tls = Some(TlsSettings(ca, p("client.pem"), p("client.p8"),
        insecureSkipVerify = skipVerify)))

  private def tlsSocketFactory(s: MqttSettings): java.net.Socket =
    TcpMqttConnector.sslContext(s.tls.get)
      .getSocketFactory.createSocket(s.host, s.port)

  test("mutual-TLS MQTT session: subscribe + publish over encrypted channel") {
    val broker = tlsBroker()
    try {
      val c = new TcpMqttConnector(
        settings(broker.port, p("ca.pem")), tlsSocketFactory).connect()
      try {
        c.setSubscriptions("tls-spec", Seq("/sec/#"))
        broker.publish("/sec/a", "encrypted-payload")
        val deadline = System.currentTimeMillis() + 5000
        while (c.latestSeq("tls-spec") < 1 &&
          System.currentTimeMillis() < deadline) Thread.sleep(20)
        val msgs = c.fetch("tls-spec", 0, 1)
        assert(msgs.map(m => (m.topic, m.payload)) ==
          Seq(("/sec/a", "encrypted-payload")))
      } finally c.close()
    } finally broker.close()
  }

  test("untrusted server certificate fails CLOSED (InsecureSkipVerify fix)") {
    val broker = tlsBroker()
    try {
      // client trusts only the unrelated CA → handshake must fail
      intercept[Exception] {
        new TcpMqttConnector(
          settings(broker.port, p("other.pem")), tlsSocketFactory).connect()
      }
    } finally broker.close()
  }

  test("insecureSkipVerify=true restores the reference's behavior (opt-in)") {
    val broker = tlsBroker()
    try {
      val c = new TcpMqttConnector(
        settings(broker.port, p("other.pem"), skipVerify = true),
        tlsSocketFactory).connect()
      try assert(c.latestSeq("tls-spec") == 0) // connected fine
      finally c.close()
    } finally broker.close()
  }
}
