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
    * truncate to microsecond TimestampType — the same truncation DuckDB
    * applies, so oracle comparisons line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          (org.apache.spark.sql.functions.col("ts") / 1000L)
            .cast(org.apache.spark.sql.types.LongType)))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
