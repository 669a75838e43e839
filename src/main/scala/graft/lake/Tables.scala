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
  /** `events.parquet`'s `ts` column has shipped in THREE real-world parquet
    * encodings across testdata regenerations, so the reader dispatches on
    * the scanned Spark type instead of assuming one (the encoding is an
    * upstream writer's choice, not ours — same drift class as the
    * reference's two inconsistent timestamp encodings,
    * src/bitoin_coin_gecko_api.py:50-53 vs src/scrapping_b3.py:113):
    *
    *  - `LongType` — parquet TIMESTAMP(NANOS) read with `nanosAsLong`
    *    (Spark refuses NANOS by default, PARQUET_TYPE_ILLEGAL). Truncate
    *    to µs with INTEGER division (`ts div 1000`): `/ 1000` is double
    *    division and at epoch-nanos magnitude (~1.8e18, ulp 256 ns) the
    *    rounded double can differ from truncation by 1 µs (ADVICE r1).
    *  - `TimestampNTZType` — parquet TIMESTAMP(isAdjustedToUTC=false,
    *    MICROS). The lake's NTZ wall clocks ARE UTC instants, so the
    *    NTZ→LTZ conversion must not depend on the session TZ: a plain
    *    `cast("timestamp")` reinterprets the wall clock in the SESSION
    *    zone — identity under our pinned-UTC builders but silently
    *    shifted in a foreign session (ADVICE r8). [[ntzToUtcInstant]]
    *    instead reinterprets via `convert_timezone('UTC', sessionTZ, ·)`
    *    before the cast: identity when the session is UTC, and the
    *    correct UTC instant under any other zone. `EventsEncodingSpec`
    *    pins both (UTC identity + a São-Paulo session reading the same
    *    instants).
    *  - `TimestampType` — parquet TIMESTAMP(isAdjustedToUTC=true, MICROS),
    *    passthrough.
    *
    * `nanosAsLong` is pre-set by all of our session builders
    * (Verify/Bench/TestSpark); the set here is a defensive idempotent
    * fallback for driver-owned sessions that call SparkEntry.queries
    * directly — without it a NANOS-encoded file fails to read at all.
    */
  /** UTC-instant interpretation of an NTZ column, independent of the
    * session timezone (see `events` scaladoc). The session TZ is read at
    * PLAN time — the only way to defeat this is changing the TZ between
    * building the DataFrame and executing it, which also breaks every
    * built-in string↔timestamp expression in the plan.
    */
  private def ntzToUtcInstant(s: SparkSession,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{convert_timezone, lit}
    val sessionTz = s.conf.get("spark.sql.session.timeZone")
    convert_timezone(lit("UTC"), lit(sessionTz), c).cast("timestamp")
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", ntzToUtcInstant(s, col("ts")))
      case _                => raw
    }
  }
  /** `events` with a `[from, until)` time filter applied to the RAW
    * scanned `ts` column BEFORE any timestamp conversion, so the
    * predicate reaches the parquet scan — `PushedFilters: GreaterThanOrEqual/
    * LessThan(ts)` plus row-group min/max pruning. Filtering the plain
    * `events` path compares a DERIVED column and evaluates post-scan: a
    * one-day query still reads the whole table (r5 verdict #2; the
    * reference's one real query takes exactly this shape — a 7-day WHERE,
    * ETL_glue_pregao_B3.json:164). At 100 TB with date-partitioned or
    * time-sorted event logs, this is the difference between scanning a
    * day and scanning a month.
    *
    * Same three-way encoding dispatch as `events` (see its scaladoc); each
    * branch filters in the scanned column's own type — nanos-long literals
    * for NANOS files, NTZ literals for NTZ files — then converts.
    *
    * Bounds are UTC `yyyy-MM-dd HH:mm:ss` strings, from-inclusive /
    * until-exclusive, and every branch builds its bound literals
    * TZ-independently: epoch nanos/micros computed in Scala at explicit
    * UTC offset for the LongType and TimestampType branches, a pure
    * wall-clock string→NTZ parse for the NTZ branch (ADVICE r8 — the
    * previous `lit(str).cast("timestamp")` parsed in the session zone).
    * For WHOLE-SECOND bounds the raw-nanos filter admits exactly the rows
    * the converted-µs filter would (truncation can't cross a whole-second
    * boundary), so swapping it in never changes a result — only the scan.
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
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= nanos(fromUtc) && col("ts") < nanos(untilUtc))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.filter(col("ts") >= lit(fromUtc).cast(TimestampNTZType) &&
            col("ts") < lit(untilUtc).cast(TimestampNTZType))
          .withColumn("ts", ntzToUtcInstant(s, col("ts")))
      case _ =>
        raw.filter(col("ts") >= timestamp_micros(lit(nanos(fromUtc) / 1000L)) &&
          col("ts") < timestamp_micros(lit(nanos(untilUtc) / 1000L)))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
