package graft.sources.mqtt

import java.io.{BufferedInputStream, BufferedOutputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import scala.collection.mutable.ArrayBuffer

import MqttCodec._

/** In-JVM MQTT 3.1.1 broker over REAL TCP sockets — the spec-side peer
  * for [[TcpMqttConnector]]. Listens on an ephemeral localhost port,
  * handles CONNECT/SUBSCRIBE/UNSUBSCRIBE/PUBLISH/PUBACK/PING/DISCONNECT,
  * and lets tests push server-side publishes and sever connections to
  * exercise the reconnect path. Auth: a configured (user, pass) pair is
  * enforced with CONNACK rc=4 (bad user name or password) on mismatch. */
final class MiniMqttBroker(requireAuth: Option[(String, String)] = None,
    serverSocket: () => ServerSocket = () => new ServerSocket(0))
    extends AutoCloseable {

  private val server = serverSocket()
  def port: Int = server.getLocalPort

  @volatile private var running = true
  val connectCount = new AtomicInteger(0)
  val pubAcksReceived = new AtomicInteger(0)
  val lastCredentials =
    new AtomicReference[(Option[String], Option[String])]((None, None))

  private final class Session(val socket: Socket, val out: OutputStream) {
    @volatile var subs: Seq[String] = Nil
    val pid = new AtomicInteger(0)
    def send(p: Packet): Unit = out.synchronized {
      out.write(encode(p)); out.flush()
    }
  }
  private val sessions = new ArrayBuffer[Session]()

  private val acceptThread = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s), s"mini-broker-${s.getPort}")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }
  }, "mini-broker-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def handle(socket: Socket): Unit = {
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
    val session = new Session(socket, out)
    try {
      read(in) match {
        case Connect(_, user, pass, _, _) =>
          lastCredentials.set((user, pass))
          val ok = requireAuth.forall { case (u, p) =>
            user.contains(u) && pass.contains(p)
          }
          connectCount.incrementAndGet()
          session.send(ConnAck(sessionPresent = false,
            returnCode = if (ok) 0 else 4))
          if (!ok) { socket.close(); return }
        case other =>
          socket.close()
          throw new IllegalStateException(s"expected CONNECT, got $other")
      }
      sessions.synchronized { sessions += session }
      while (running && !socket.isClosed) {
        read(in) match {
          case Subscribe(pid, topics) =>
            session.subs = session.subs ++ topics.map(_._1)
            session.send(SubAck(pid, topics.map(_ => 1)))
          case Unsubscribe(pid, topics) =>
            session.subs = session.subs.filterNot(topics.contains)
            session.send(UnsubAck(pid))
          case Publish(topic, payload, qos, pid, _, _) =>
            if (qos >= 1) session.send(PubAck(pid))
            route(topic, new String(payload, UTF_8))
          case PubAck(_) => pubAcksReceived.incrementAndGet()
          case PingReq => session.send(PingResp)
          case Disconnect => socket.close()
          case _ => ()
        }
      }
    } catch {
      case _: Exception => () // connection gone
    } finally {
      // always release the socket — a handler error must not leave the
      // peer blocked waiting on a response
      try socket.close() catch { case _: Exception => () }
      sessions.synchronized { sessions -= session }
    }
  }

  private def route(topic: String, payload: String): Int =
    sessions.synchronized {
      var n = 0
      sessions.foreach { s =>
        if (s.subs.exists(InMemoryBroker.matches(_, topic))) {
          s.send(Publish(topic, payload.getBytes(UTF_8), qos = 1,
            packetId = (s.pid.incrementAndGet() & 0xffff).max(1)))
          n += 1
        }
      }
      n
    }

  /** Server-side publish to every matching subscriber (QoS 1). */
  def publish(topic: String, payload: String): Int = route(topic, payload)

  /** Sever every live connection without DISCONNECT — the broker-restart
    * / network-partition case the client must auto-recover from. */
  def dropAllConnections(): Unit = sessions.synchronized {
    sessions.foreach(s => try s.socket.close() catch { case _: Exception => () })
    sessions.clear()
  }

  def activeSessions: Int = sessions.synchronized(sessions.size)

  override def close(): Unit = {
    running = false
    dropAllConnections()
    try server.close() catch { case _: Exception => () }
  }
}
