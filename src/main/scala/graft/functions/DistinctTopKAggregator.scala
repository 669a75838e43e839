package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKAggregator]] with EXACT-DUPLICATE tolerance: top-k over the
  * DISTINCT (score, id) tuples of the group, partial-aggregable.
  *
  * Why it exists (r9 ANN restructure): scoring candidates INSIDE the
  * LSH bucket self-join emits one row per (pair, colliding table) —
  * the same (score, id) tuple up to 8 times, bit-identical doubles
  * (same codegen'd fold over the same arrays). Deduping that stream
  * with `dropDuplicates` before ranking costs a pair-grain exchange —
  * the dominant shuffle of the ANN family at the 100× tier
  * (SCALE10TO100_ANN.json). This aggregator makes the dedup part of
  * the partial aggregation instead: each map task keeps its local
  * top-k distinct tuples, the shuffle carries ≤ k rows per (task,
  * group), and merge re-dedups across tasks.
  *
  * Dedup-on-insert is load-bearing: appending a tuple already in the
  * buffer and re-taking k would hold the duplicate TWICE and could
  * evict a legitimate k-th distinct entry. A duplicate of a tuple
  * previously EVICTED is harmless — eviction means k strictly-better
  * tuples exist, so the re-offered duplicate loses the same
  * comparison again ((score desc, id asc) is a strict total order on
  * distinct tuples).
  *
  * Only sound when equal logical candidates carry bit-identical
  * scores (true for the ANN use: one deterministic expression over
  * the same inputs). Scores must not be NaN (NaN != NaN breaks
  * `contains`); cosines over non-zero-norm vectors satisfy this.
  */
class DistinctTopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.contains(in)) buf
    else ((in +: buf).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).distinct.sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
