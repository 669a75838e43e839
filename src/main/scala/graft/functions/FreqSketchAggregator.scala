package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed `Aggregator` (the
  * brief's "novel sketch" custom-operator slot, next to
  * [[TopKAggregator]]).
  *
  * Guarantee (Misra-Gries '82; mergeability: Agarwal et al., "Mergeable
  * Summaries", PODS '12): with k counters over n items, every counter
  * undercounts its item's true frequency by at most n/(k+1) — so every
  * item with true count > n/(k+1) is GUARANTEED present in the output.
  * No false negatives above that threshold; false positives possible.
  *
  * Why this beats count+filter at 100 TB: the exact heavy-hitter query
  * `groupBy(token).count().filter(cnt >= t)` shuffles one record per
  * DISTINCT token — for web-scale text that's billions of keys, nearly
  * all of which are below threshold. This sketch is partial-aggregable:
  * each map task reduces its slice to ≤ k counters, the shuffle carries
  * k rows per task, and merges stay ≤ k. The intended production shape
  * is the TWO-PASS pattern (see `TextAnalysis.t8FrequentTokens`):
  * sketch → candidate superset (≤ k) → broadcast → exact recount of
  * candidates only — deterministic exact output, sketch-bounded cost.
  *
  * BUF is the counter map; `merge` adds counterparts then, if over k
  * entries, subtracts the (k+1)-th largest count from all and drops the
  * non-positive (the PODS '12 merge — preserves the error bound).
  * `finish` returns surviving items sorted by (estimate desc, item asc)
  * for determinism.
  */
class FreqSketchAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // full and item absent: decrement all, drop zeros (classic MG).
        // O(k) when it fires — amortized fine because each firing sheds
        // weight k+1 (total decrements across a slice of n items are
        // ≤ n/(k+1) firings); the constant-time offset variant (global
        // subtrahend + lazy per-entry catch-up) is the upgrade if a
        // profiler ever shows this path hot.
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }.map(_._1)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
