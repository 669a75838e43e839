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
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
