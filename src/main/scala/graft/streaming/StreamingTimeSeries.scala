package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming continuation of [[graft.operators.TimeSeries]]: per-key
  * EWMA level and rolling z-score anomaly flags over an unbounded point
  * stream, via `flatMapGroupsWithState`. The batch operators are the
  * contract — for in-order points this emits EXACTLY the batch
  * `anomalyZScore` row (same round-6 quantization, same exact-decimal
  * rolling moments, same correctly-rounded tail ops) and folds EXACTLY
  * the batch `ewma` recursion (state keeps the unrounded level, output
  * rounds, like the batch fold that rounds only at the end) — the spec
  * holds both to bitwise equality across micro-batch cuts.
  *
  * State per key is the EWMA level plus the last `win` quantized
  * values — O(win) doubles, bounded by construction; `idleTimeout`
  * additionally evicts cold keys (same trade-off as
  * [[StreamingSessionize]]: a re-appearing key restarts its window).
  * Points are ordered by bucket within each micro-batch; cross-batch
  * order relies on the source, as everywhere in this package. */
object StreamingTimeSeries {

  case class Point(key: Long, bucket: Long, value: Double)
  case class Scored(key: Long, bucket: Long, v: Double, n_prior: Long,
                    z: Option[Double], is_anomaly: Boolean, ewma: Double)
  case class TsState(level: Double, seeded: Boolean, ring: List[Double])

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def score(points: Dataset[Point], win: Int, alpha: Double,
            threshold: Double = 3.0,
            idleTimeout: Option[String] = None): Dataset[Scored] = {
    require(win >= 2, s"need win >= 2, got $win")
    require(alpha > 0.0 && alpha <= 1.0, s"need 0 < alpha <= 1, got $alpha")
    implicit val stateEnc = Encoders.product[TsState]
    implicit val outEnc = Encoders.product[Scored]
    implicit val keyEnc = Encoders.scalaLong
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Point], state: GroupState[TsState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(TsState(0.0, false, Nil))
            val out = it.toIndexedSeq.sortBy(_.bucket).map { p =>
              val vq = r6(p.value)
              // rolling moments over the ring: exact decimal sums of the
              // quantized v and v² — the batch operator's DECIMAL window
              // sums, replayed; BigDecimal→double is correctly rounded,
              // as is each remaining op, so z is bit-identical
              val n = st.ring.size
              val z: Option[Double] = if (n >= 2) {
                val s1 = st.ring.map(BigDecimal(_)).sum.toDouble
                val s2 = st.ring.map(v => BigDecimal(r6(v * v))).sum.toDouble
                val varP =
                  math.max((s2 - s1 * s1 / n) / (n - 1), 0.0)
                val sd = math.sqrt(varP)
                if (sd > 0) Some(r6((vq - s1 / n) / sd)) else None
              } else None
              // batch ewma folds alpha*x + (1-alpha)*acc on the RAW
              // doubles (only the output rounds), seeding with the
              // first value — vq feeds the z-score only
              val lvl = if (!st.seeded) p.value
                        else alpha * p.value + (1.0 - alpha) * st.level
              st = TsState(lvl, seeded = true,
                (st.ring :+ vq).takeRight(win))
              Scored(key, p.bucket, vq, n.toLong,
                z, z.exists(math.abs(_) > threshold), r6(lvl))
            }
            if (out.nonEmpty) {
              state.update(st)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }
  }
}
