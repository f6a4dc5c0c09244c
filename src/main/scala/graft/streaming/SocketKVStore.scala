package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

/** A network-backed [[KVStore]] over a line protocol on a plain TCP socket —
  * the smallest possible stand-in for the reference's Redis backend
  * (`CommonUtil.scala:39-49`), built on the JDK only so the contract can be
  * exercised across a REAL process/network boundary (no client jar ships
  * with the build).
  *
  * The instance is a cheap serializable HANDLE: executor closures capture it
  * directly (no registry needed on executors), and the actual connection is
  * established lazily once per JVM per (host, port) in
  * [[SocketKVStore.pooled]] — the per-executor pooled-client pattern a Redis
  * implementation would use, and the opposite of the reference's
  * pool-per-call leak.
  *
  * Protocol (UTF-8 lines; key/field base64-encoded so they may contain
  * anything): `HINCRBY <key> <field> <delta>` → `<long>`;
  * `HGETALL <key>` → `<field>:<v> ...`; `MARK|SEEN <id>` → `1|0`.
  */
final class SocketKVStore(host: String, port: Int) extends KVStore {
  import SocketKVStore._

  private def call(line: String): String = pooled(host, port, line)

  override def hincrBy(key: String, field: String, delta: Long): Long =
    call(s"HINCRBY ${b64(key)} ${b64(field)} $delta").toLong

  override def hgetAll(key: String): Map[String, Long] = {
    val resp = call(s"HGETALL ${b64(key)}")
    if (resp.isEmpty) Map.empty
    else resp.split(" ").map { kv =>
      // ':' as separator — '=' appears in base64 padding
      val Array(f, v) = kv.split(":", 2)
      unb64(f) -> v.toLong
    }.toMap
  }

  override def markBatch(batchId: Long): Boolean = call(s"MARK $batchId") == "1"

  override def batchSeen(batchId: Long): Boolean = call(s"SEEN $batchId") == "1"
}

object SocketKVStore {
  private[streaming] def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private[streaming] def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  private final class Conn(host: String, port: Int) {
    val socket = new Socket(host, port)
    val in = new BufferedReader(
      new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(socket.getOutputStream, true, StandardCharsets.UTF_8)
  }

  private val conns = new ConcurrentHashMap[(String, Int), Conn]()

  /** One shared connection per JVM per endpoint; calls are serialized on it
    * (a production client would hold a pool instead of a mutex). A dead
    * connection is evicted on failure so the NEXT call reconnects — without
    * the eviction one server restart would poison the cache entry and fail
    * every later call to that endpoint for the life of the JVM. */
  private def pooled(host: String, port: Int, line: String): String = {
    val key = (host, port)
    val c = conns.computeIfAbsent(key, _ => new Conn(host, port))
    c.synchronized {
      try {
        c.out.println(line)
        val resp = c.in.readLine()
        require(resp != null, s"KV server at $host:$port closed the connection")
        if (resp.startsWith("ERR ")) throw new IllegalStateException(resp)
        resp.stripPrefix("OK ")
      } catch {
        case e: Throwable if !e.isInstanceOf[IllegalStateException] =>
          // transport-level failure: drop the connection, not the endpoint
          conns.remove(key, c)
          try c.socket.close() catch { case _: Throwable => () }
          throw e
      }
    }
  }

  /** Drop cached connections (test teardown). */
  def resetConnections(): Unit = {
    conns.values.forEach(c => try c.socket.close() catch { case _: Throwable => () })
    conns.clear()
  }

  /** Sever every cached connection WITHOUT forgetting it (crash-injection
    * test hook): the next call on a severed connection fails at the
    * transport level and takes the eviction path — to the pooled client
    * this is indistinguishable from the link dying under a running task,
    * which is exactly the executor-side failure the crash specs inject. */
  def killConnections(): Unit =
    conns.values.forEach(c => try c.socket.close() catch { case _: Throwable => () })
}

/** Minimal thread-per-connection server speaking the [[SocketKVStore]]
  * protocol, backed by an [[InMemoryKVStore]]. Test/demo scaffolding for the
  * network path — run it in a separate thread or process and point any
  * number of [[SocketKVStore]] handles at it. Pass `backing` to restart a
  * server over surviving data — the serving process dies, the store's
  * contents don't, which is how a persistent KV backend (Redis with AOF)
  * behaves across a crash. */
final class KVServer(bind: String = "127.0.0.1", fixedPort: Int = 0,
                     backing: InMemoryKVStore = new InMemoryKVStore)
    extends SocketServerBase(bind, fixedPort) {
  import SocketKVStore.{b64, unb64}

  val store: InMemoryKVStore = backing

  override protected def serveLoop(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(sock.getOutputStream, true, StandardCharsets.UTF_8)
    var line = in.readLine()
    while (line != null) {
      out.println(try handle(line) catch { case e: Throwable => s"ERR ${e.getMessage}" })
      line = in.readLine()
    }
  }

  private def handle(line: String): String = line.split(" ").toList match {
    case "HINCRBY" :: k :: f :: d :: Nil =>
      "OK " + store.hincrBy(unb64(k), unb64(f), d.toLong)
    case "HGETALL" :: k :: Nil =>
      "OK " + store.hgetAll(unb64(k)).toSeq.sortBy(_._1)
        .map { case (f, v) => s"${b64(f)}:$v" }.mkString(" ")
    case "MARK" :: id :: Nil => "OK " + (if (store.markBatch(id.toLong)) 1 else 0)
    case "SEEN" :: id :: Nil => "OK " + (if (store.batchSeen(id.toLong)) 1 else 0)
    case _ => s"ERR bad command: $line"
  }
}
