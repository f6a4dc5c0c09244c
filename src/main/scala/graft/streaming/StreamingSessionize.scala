package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState`: gap-based session
  * assignment that survives across micro-batches (the batch engine's
  * [[graft.operators.Sessionize]] semantics, continued incrementally).
  *
  * State per key is 16 bytes (current session id + last event time) in
  * Spark's state store, checkpointed with the query — the capability the
  * reference externalized to Redis, here kept inside the engine. Events
  * within a micro-batch are ordered by event time before assignment;
  * cross-batch ordering relies on the source being per-key ordered (or a
  * watermark+sort stage upstream).
  */
object StreamingSessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Assigned(user_id: Long, ts: java.sql.Timestamp, session_id: Long)
  case class SessionState(sessionId: Long, lastTsMillis: Long)

  /** `idleTimeout` (e.g. Some("2 hours")) bounds state size for
    * production streams: a key idle longer than the timeout has its state
    * evicted — safe, because any later event would have started a new
    * session anyway once the gap passed (only the session counter is
    * forgotten, so ids restart at 1 for that key; bounded state is what
    * matters at high key cardinality). Default None = NoTimeout, which
    * also keeps `processAllAvailable`-style synchronous testing usable
    * (processing-time timeouts keep a query perpetually busy). */
  def assign(events: Dataset[Event], gapSeconds: Long,
             idleTimeout: Option[String] = None): Dataset[Assigned] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Assigned]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
            var (sid, last) = state.getOption
              .map(s => (s.sessionId, s.lastTsMillis))
              .getOrElse((0L, Long.MinValue))
            val out = sorted.map { e =>
              val t = e.ts.getTime
              if (last == Long.MinValue || t - last > gapSeconds * 1000L) sid += 1
              last = t
              Assigned(uid, e.ts, sid)
            }
            if (sorted.nonEmpty) {
              state.update(SessionState(sid, last))
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }
  }
}
