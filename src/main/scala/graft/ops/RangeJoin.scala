package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs (l, r) with equal key and `rightTs` within
  * `[leftTs - before, leftTs + after]` — the second operator the brief
  * names that Spark lacks. What Spark does without it (both shapes
  * pinned in RangeJoinSpec):
  *   - no equi conjunct (pure time band): BroadcastNestedLoopJoin /
  *     cartesian — O(L × R) comparisons, the canonical scale-killer
  *     (Databricks' range-join optimization exists because of it);
  *   - with an equi key: a hash join that generates EVERY same-key
  *     pair and filters the band as a residual condition —
  *     O(Σ_k L_k × R_k), quadratic in each hot key's row count. Fine
  *     for uniform small keys; a 100 TB power-law key (one user with
  *     10^6 events) makes one task do 10^12 comparisons.
  *
  * This form stays an EQUI-join on (key, bucket) and is never
  * quadratic in a key's size: quantize time into buckets of width
  * W = before + after. A right row lands in exactly ONE bucket
  * (`rightTs div W`); a left row's window spans at most TWO adjacent
  * buckets, enumerated with `sequence()` (≤ 2× left fan-out,
  * independent of data size). Join on (key, bucket) — hash join,
  * shuffle or broadcast as stats dictate — then post-filter the exact
  * band. A matching pair shares exactly one bucket, so no dedup is
  * needed. Cost: O(L + R) shuffled rows and only same-bucket (time-
  * adjacent) candidates compared; a hot key's pairs are further split
  * across its time buckets instead of colliding in one hash bucket.
  *
  * Timestamps are compared at microsecond precision (`unix_micros`).
  * Bucket ids use `div` (truncating) — correct for post-1970 data;
  * pre-epoch timestamps would need floor division.
  */
object RangeJoin {

  def banded(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      beforeSec: Long, afterSec: Long = 0L): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && beforeSec + afterSec > 0,
      "window must be non-negative and non-empty")
    val w = (beforeSec + afterSec) * 1000000L
    // SQL `div` (exact long division) for bucket ids: double `/` + cast
    // can mis-bucket at boundaries once epoch-micros exceed 2^53 scale
    val l2 = left
      .withColumn("__lo", unix_micros(col(leftTs)) - lit(beforeSec * 1000000L))
      .withColumn("__hi", unix_micros(col(leftTs)) + lit(afterSec * 1000000L))
      .withColumn("__b", explode(expr(s"sequence(__lo div ${w}L, __hi div ${w}L)")))
    val r2 = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__b", expr(s"__rus div ${w}L"))
    l2.join(r2, Seq(key, "__b"))
      .filter(col("__rus").between(col("__lo"), col("__hi")))
      .drop("__b", "__lo", "__hi", "__rus")
  }
}
