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

  def assign(events: Dataset[Event], gapSeconds: Long): Dataset[Assigned] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Assigned]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
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
          if (sorted.nonEmpty) state.update(SessionState(sid, last))
          out.iterator
      }
  }
}
