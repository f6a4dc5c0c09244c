package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]] — the scale-correct form of
  * "rank per query, keep the best k".
  *
  * The Window formulation (`row_number().over(partitionBy(query_id)
  * .orderBy(score desc, id)) <= k`) shuffles EVERY scored candidate row
  * to the ranking exchange and sorts O(N) rows per query inside at most
  * |queries| effective partitions — at corpus scale the ranking step is
  * a full-corpus shuffle whose parallelism is capped by the query count.
  * This aggregator keeps at most k candidates per group in the PARTIAL
  * buffers, so the map side reduces each scan partition to k rows per
  * query before the exchange: shuffled volume drops from N×Q rows to
  * (scan partitions)×Q×k, and nothing ever sorts more than k elements.
  *
  * Ordering parity with the Window form is EXACT, including edge cases:
  * candidates order by (score IS NULL ASC, score DESC, cand_id ASC) —
  * Spark's `desc` is nulls-last, ties break to the lowest id — so the
  * same rows with the same ranks survive, bit-for-bit, and the DuckDB
  * oracles that held the Window plans hold these. The buffer comparator
  * is a total order and merge keeps the k best of both halves, so
  * partial aggregation is associative and commutative.
  */
class TopKAggregator(k: Int)
    extends Aggregator[TopKAggregator.In, TopKAggregator.Buf, TopKAggregator.Out] {
  import TopKAggregator._

  override def zero: Buf = Buf(Vector.empty)

  // (isNull asc, score desc, id asc) — strictly "a ranks before b".
  // Score comparison must reproduce Spark's nanSafeCompareDoubles
  // exactly: NaN totally ordered above every double (a plain `!=`/`>` is
  // not a total order under NaN — buffer contents would become
  // insertion-order-dependent), AND -0.0 == 0.0 a TIE broken by cand_id
  // (raw Double.compare ranks 0.0 above -0.0, which would diverge from
  // the Window form when a cosine underflows to a negative zero). The
  // `==` test first yields the tie for ±0.0 and equal values while NaN
  // falls through (NaN != NaN) to Double.compare, which handles
  // NaN-vs-x and NaN-vs-NaN like Spark does.
  private def before(a: Entry, b: Entry): Boolean =
    if (a.isNull != b.isNull) !a.isNull
    else {
      val c =
        if (a.isNull || a.score == b.score) 0
        else java.lang.Double.compare(a.score, b.score)
      if (c != 0) c > 0 else a.cand_id < b.cand_id
    }

  private def insert(buf: Vector[Entry], e: Entry): Vector[Entry] = {
    // fast reject: a full buffer whose worst entry outranks e is returned
    // untouched — the overwhelmingly common case on a big scan, and the
    // reason per-row cost is one comparison, not an allocation
    if (buf.length == k && !before(e, buf.last)) buf
    else {
      // bounded insertion into a sorted vector (k is small)
      val i = buf.indexWhere(x => before(e, x)) match {
        case -1 => buf.length
        case j  => j
      }
      if (i >= k) buf
      else {
        val grown = (buf.take(i) :+ e) ++ buf.drop(i)
        if (grown.length > k) grown.take(k) else grown
      }
    }
  }

  override def reduce(b: Buf, in: In): Buf =
    Buf(insert(b.entries, Entry(in.score == null, if (in.score == null) 0.0 else in.score.doubleValue(), in.cand_id)))

  override def merge(x: Buf, y: Buf): Buf =
    Buf(y.entries.foldLeft(x.entries)(insert))

  override def finish(b: Buf): Out =
    b.entries.zipWithIndex.map { case (e, i) =>
      Ranked(i + 1, e.cand_id, if (e.isNull) null else java.lang.Double.valueOf(e.score))
    }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Out]()
}

object TopKAggregator {
  case class In(cand_id: Long, score: java.lang.Double)
  case class Entry(isNull: Boolean, score: Double, cand_id: Long)
  case class Buf(entries: Vector[Entry])
  case class Ranked(rk: Int, cand_id: Long, score: java.lang.Double)
  type Out = Seq[Ranked]
}
