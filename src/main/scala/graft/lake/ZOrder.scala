package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering — the lake-layout operator
  * behind "OPTIMIZE ... ZORDER BY" in table formats: interleave the
  * bits of two scaled column values so rows close in BOTH dimensions
  * land close in the sort order, then range-partition + sort the
  * write by that key. Parquet row-group/file min-max stats then prune
  * scans that filter on EITHER dimension (a single-column sort only
  * prunes its own column; the other dimension's values are spread
  * uniformly across every file). At 100 TB this is the difference
  * between a two-predicate scan touching a few files and touching all
  * of them — the spec pins exactly that file-count comparison.
  *
  * The interleave is pure integer bit arithmetic (generated as a sum
  * of disjoint bit terms — identical SQL in Spark and DuckDB, so the
  * key itself is oracle-checkable: z1_zorder_key).
  */
object ZOrder {

  private val Bits = 16

  /** SQL expression interleaving the low [[Bits]] bits of two
    * non-negative int expressions: a's bit i lands at position 2i+1,
    * b's at 2i. Terms are disjoint bits, so `+` assembles them (no
    * bit_or needed — keeps the expression portable).
    */
  def interleaveSql(a: String, b: String): String =
    (0 until Bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i + 1})",
        s"((($b >> $i) & 1) << ${2 * i})")
    }.mkString("(", " + ", ")")

  /** z1: the Morton key itself over events — user_id and centi-unit
    * value folded to [[Bits]] bits via pmod (the oracle-friendly
    * scaling; [[cluster]] uses min-max scaling for real layouts).
    */
  def z1ZorderKey(s: SparkSession, d: String): DataFrame = {
    val a = s"pmod(user_id, 65536)"
    val b = s"pmod(cast(floor(value * 100) as bigint), 65536)"
    Tables.events(s, d)
      .select(col("event_id"),
        expr(interleaveSql(a, b)).as("z"))
      .orderBy("event_id")
  }

  /** Cluster `df` for a 2-D-filterable layout: min-max scale both
    * columns into [[Bits]] bits, range-partition on the interleaved
    * key into `buckets` output files, sort within partitions. The
    * min/max pair is a 1-row agg collected on the driver — a bounded
    * constant (two doubles), not data; at scale it comes from table
    * stats for free.
    */
  def cluster(df: DataFrame, aCol: String, bCol: String,
      buckets: Int): DataFrame = {
    val Array(r) = df.agg(
      min(col(aCol)).cast("double"), max(col(aCol)).cast("double"),
      min(col(bCol)).cast("double"), max(col(bCol)).cast("double"))
      .collect()
    val (aMin, aMax, bMin, bMax) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val top = (1 << Bits) - 1
    def scaled(c: String, lo: Double, hi: Double): String =
      if (hi <= lo) "0L"
      else s"cast(floor((cast($c as double) - $lo) / ${hi - lo} * $top) as bigint)"
    df.withColumn("__z", expr(interleaveSql(
        scaled(aCol, aMin, aMax), scaled(bCol, bMin, bMax))))
      .repartitionByRange(buckets, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z1_zorder_key" -> (z1ZorderKey _)
  )

  def oracles: Map[String, String] = {
    val a = "(user_id % 65536)"
    val b = "(CAST(floor(value * 100) AS BIGINT) % 65536)"
    Map(
      "z1_zorder_key" ->
        s"""SELECT event_id, ${interleaveSql(a, b)} AS z
           |FROM events ORDER BY event_id""".stripMargin
    )
  }
}
