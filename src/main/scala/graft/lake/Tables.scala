package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the lake's parquet tables (TESTDATA.md layout:
  * `<dir>/<name>.parquet`, one parquet file-or-dir per table).
  *
  * Scale notes (100 TB): the same API works when `<name>.parquet` is a
  * multi-thousand-file partitioned directory — `spark.read.parquet` does
  * partition discovery, and Catalyst pushes filters/projections into the
  * scan. Callers must NOT `.cache()` whole tables here; they declare the
  * plan and let the optimizer prune.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * refuses by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    * truncate to microsecond TimestampType with INTEGER division (`div`) —
    * `/ 1000` is double division and at epoch-nanos magnitude (~1.8e18,
    * ulp 256 ns) the rounded double can differ from truncation by 1 µs
    * (ADVICE r1). `ts div 1000` matches DuckDB's truncation exactly.
    *
    * `nanosAsLong` is pre-set by all of our session builders
    * (Verify/Bench/TestSpark); the set here is a defensive idempotent
    * fallback for driver-owned sessions that call SparkEntry.queries
    * directly — without it the read throws, so it is required, not a
    * convenience.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  /** `events` with a `[from, until)` time filter applied to the RAW
    * nanos-long `ts` column BEFORE the timestamp conversion, so the
    * predicate reaches the parquet scan — `PushedFilters: GreaterThanOrEqual/
    * LessThan(ts)` plus row-group min/max pruning. Filtering the plain
    * `events` path compares a DERIVED column and evaluates post-scan: a
    * one-day query still reads the whole table (r5 verdict #2; the
    * reference's one real query takes exactly this shape — a 7-day WHERE,
    * ETL_glue_pregao_B3.json:164). At 100 TB with date-partitioned or
    * time-sorted event logs, this is the difference between scanning a
    * day and scanning a month.
    *
    * Bounds are UTC `yyyy-MM-dd HH:mm:ss` strings, from-inclusive /
    * until-exclusive. For WHOLE-SECOND bounds the raw-nanos filter admits
    * exactly the rows the converted-µs filter would (truncation can't
    * cross a whole-second boundary), so swapping it in never changes a
    * result — only the scan.
    */
  def eventsBetween(s: SparkSession, d: String,
                    fromUtc: String, untilUtc: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    def nanos(t: String): Long = {
      val inst = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000000L + inst.getNano
    }
    import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros}
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.filter(col("ts") >= nanos(fromUtc) && col("ts") < nanos(untilUtc))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else // already-µs reader (driver-owned session without nanosAsLong)
      raw.filter(col("ts") >= lit(fromUtc).cast("timestamp") &&
        col("ts") < lit(untilUtc).cast("timestamp"))
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
