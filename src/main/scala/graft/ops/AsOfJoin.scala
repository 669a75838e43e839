package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (AS-OF) join: for every left row, the single right row
  * with the greatest `rightTs` <= `leftTs` for the same key — the batch
  * twin of [[graft.streaming.Streams.enrichStreamLatest]] and the join
  * DuckDB spells `ASOF JOIN`. Spark has no native operator for it
  * (SPARK-22947 never merged), and the naive encoding —
  * `left.join(right, key && rTs <= lTs)` then keep the max-rTs match —
  * materializes every (left row × earlier right row) pair before
  * reducing: O(L × R_per_key) intermediate rows, a scale-killer when a
  * key has thousands of reference updates.
  *
  * This form never fans out: UNION the two sides (right rows carry
  * their payload as one struct, left rows a null), then one window
  * partitioned by key and ordered by (ts, side) carries
  * `last(__r, ignoreNulls)` forward — each left row reads the
  * most-recent right struct at or before its timestamp. ONE shuffle on
  * the key, one in-partition sort, zero join fan-out; both the window's
  * input and output are |L| + |R| rows. The struct keeps the carried
  * payload row-atomic (column-wise `last` could stitch values from
  * different right rows when payload columns hold nulls).
  *
  * Contracts: non-key column names must be disjoint across the sides;
  * `right` must be unique per (key, rightTs) — among equal-timestamp
  * right rows the carried winner is sort-arbitrary, so pre-dedup
  * (e.g. keep max id) for deterministic output. Ties `rightTs ==
  * leftTs` match (inclusive <=, same as DuckDB): the right row sorts
  * before the left row at an equal timestamp. A skewed key cannot be
  * salted here (the window needs the key's full history co-located);
  * at 100 TB, bound per-key history first (e.g. pre-filter right to the
  * join's time horizon) — the window itself adds no further blowup.
  */
object AsOfJoin {

  /** @param joinType  "inner" drops left rows with no matching right
    *                   row (DuckDB `ASOF JOIN`); "left" keeps them
    *                   null-padded (`ASOF LEFT JOIN`).
    * @param direction  "backward" (default): latest right at or before
    *                   the left timestamp; "forward": earliest right at
    *                   or after it (pandas merge_asof's directions).
    * @param tolerance  optional bound on the match distance (e.g.
    *                   "1 hour"): a carried right row further than this
    *                   from the left timestamp is discarded — the
    *                   "don't enrich with a stale quote" contract.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      joinType: String = "inner",
      direction: String = "backward",
      tolerance: Option[String] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOf supports inner|left, got $joinType")
    require(direction == "backward" || direction == "forward",
      s"asOf supports backward|forward, got $direction")
    val lp = left.columns.toSeq.filterNot(_ == key)
    val rp = right.columns.toSeq.filterNot(_ == key)
    require(lp.intersect(rp).isEmpty,
      s"non-key columns must be disjoint, both sides have: ${lp.intersect(rp).mkString(", ")}")

    val rStruct = org.apache.spark.sql.types.StructType(
      rp.map(c => right.schema(c)))
    val l2 = left.select(
      col(key) +: lit(1).as("__side") +: col(leftTs).as("__ts") +:
        lp.map(col) :+ lit(null).cast(rStruct).as("__r"): _*)
    // a null-timestamp right row would sort to a partition edge and be
    // carried as a spurious "nearest" match; in timestamp-comparison
    // semantics (the naive encoding, DuckDB ASOF) null never matches —
    // drop them, and null-ts LEFT rows get their carry erased below
    val r2 = right.filter(col(rightTs).isNotNull).select(
      col(key) +: lit(0).as("__side") +: col(rightTs).as("__ts") +:
        lp.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rp.map(col): _*).as("__r"): _*)

    // backward scans time ascending (latest right ≤ ts wins); forward
    // scans descending (earliest right ≥ ts wins). Right rows sort
    // before left rows at an equal timestamp either way — inclusive.
    val order =
      if (direction == "backward") Seq(col("__ts").asc, col("__side").asc)
      else Seq(col("__ts").desc, col("__side").asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withTol = tolerance match {
      case None => identity[org.apache.spark.sql.Column] _
      case Some(t) =>
        val near =
          if (direction == "backward")
            col(s"__r.$rightTs") >= col("__ts") - expr(s"INTERVAL $t")
          else
            col(s"__r.$rightTs") <= col("__ts") + expr(s"INTERVAL $t")
        (r: org.apache.spark.sql.Column) => when(near, r)
    }
    val carried = l2.unionByName(r2)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__r", when(col("__ts").isNotNull, col("__r")))
      .withColumn("__r", withTol(col("__r")))
    val matched =
      if (joinType == "inner") carried.filter(col("__r").isNotNull)
      else carried
    matched.select(
      col(key) +: lp.map(col) ++: rp.map(c => col(s"__r.$c").as(c)): _*)
  }
}
