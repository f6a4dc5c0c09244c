package graft.streaming

import java.net.{ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap

/** Shared lifecycle of the in-process test servers ([[KVServer]]'s line
  * protocol, [[RespServer]]'s RESP framing): the SO_REUSEADDR bind with
  * fixed-port retry, the daemon acceptor with backoff, the client
  * registry with its stop-window guard, and a stop() that drops live
  * connections so a restart looks like a real server death to pooled
  * clients. Subclasses provide only the per-connection protocol loop —
  * one lifecycle definition, so a fix (e.g. to the bind retry or the
  * stop-window race) can never land in one server and drift from the
  * other. */
private[streaming] abstract class SocketServerBase(bind: String,
                                                   fixedPort: Int) {
  // SO_REUSEADDR before bind: a fixed-port restart right after a stop()
  // must not fail on the dead process's lingering TIME_WAIT sockets —
  // restartability is the point of the fixed-port mode. Reuseaddr does
  // not cover the port being transiently held as some unrelated outbound
  // connection's local ephemeral port in the gap between the old server's
  // close and this bind, so fixed-port mode also retries the bind briefly
  // (such holders are short-lived by nature).
  private val server = {
    val s = new ServerSocket()
    s.setReuseAddress(true)
    val addr = new java.net.InetSocketAddress(
      java.net.InetAddress.getByName(bind), fixedPort)
    var attempt = 0
    var bound = false
    while (!bound) {
      try { s.bind(addr, 64); bound = true }
      catch {
        case _: java.net.BindException if fixedPort != 0 && attempt < 100 =>
          attempt += 1; Thread.sleep(100)
        case e: Throwable => throw e
      }
    }
    s
  }
  private val clients = ConcurrentHashMap.newKeySet[Socket]()
  @volatile private var running = false

  def port: Int = server.getLocalPort

  /** Called on the acceptor thread for each accepted connection, before
    * its serving thread starts — hook for accept counters. */
  protected def onAccept(): Unit = ()

  /** The per-connection protocol loop: read commands, write replies,
    * return on clean EOF. IOException from a connection closed under the
    * loop is swallowed by the caller; the socket is always closed and
    * deregistered after. */
  protected def serveLoop(sock: Socket): Unit

  def start(): Unit = {
    running = true
    val acceptor = new Thread(() => {
      while (running && !server.isClosed) {
        try {
          val sock = server.accept()
          onAccept()
          val t = new Thread(() => serve(sock))
          t.setDaemon(true)
          t.start()
        } catch {
          // closed during stop() exits via the loop condition; any other
          // accept failure (fd exhaustion, transient socket error) must not
          // hot-spin — back off briefly before retrying
          case _: Throwable => if (running && !server.isClosed) Thread.sleep(50)
        }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
  }

  private def serve(sock: Socket): Unit = {
    clients.add(sock)
    // Re-check AFTER registering: a connection accepted in the window
    // between stop()'s `running = false` and its client sweep would
    // otherwise be served by a "stopped" server — the half-open behavior
    // stop() exists to prevent. Register-then-check pairs with stop()'s
    // flag-then-sweep: whichever thread runs second sees the other's
    // write, so the socket is closed on at least one path.
    if (!running) {
      clients.remove(sock)
      try sock.close() catch { case _: Throwable => () }
      return
    }
    try serveLoop(sock)
    catch { case _: java.io.IOException => () } // connection closed under us
    finally { clients.remove(sock); sock.close() }
  }

  /** Stop accepting AND drop live client connections — a restart must
    * look like a real server death to pooled clients, not a half-open
    * socket that keeps serving from the old process. */
  def stop(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
    clients.forEach(s => try s.close() catch { case _: Throwable => () })
    clients.clear()
  }
}
