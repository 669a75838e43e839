package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k as an `Aggregator[IN, BUF, OUT]` (SURVEY
  * §2.10 extension surface).
  *
  * Why not a window: `row_number().over(partitionBy(key).orderBy(...))`
  * sorts EVERY group's full row set after the shuffle. This aggregator
  * is partial-aggregable — each map task keeps only its local top-k per
  * group and the shuffle carries k rows per (task, group) instead of
  * all rows, then merges. For top-k ≪ group size on skewed groups (the
  * 100 TB case) that's the winning plan; for tiny groups the window is
  * fine. Output order inside the group: score desc, id asc —
  * deterministic, matching the window form's tie-break.
  *
  * IN = (score, id); BUF = sorted Seq of up to k (score, id); OUT = the
  * final sorted Seq.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      in: (Double, Long)): Seq[(Double, Long)] =
    ((in +: buf).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
