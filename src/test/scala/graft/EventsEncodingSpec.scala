package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp-encoding contract for external event inputs (r7 verdict #2).
  *
  * `events.parquet` is written by an upstream producer whose timestamp
  * encoding we do not control — it has already shipped as parquet
  * TIMESTAMP(NANOS) and as TIMESTAMP(isAdjustedToUTC=false, MICROS) across
  * testdata regenerations, and the reference's own inputs mix encodings the
  * same way (SURVEY §1.2: coin-gecko epoch-millis vs B3 date strings). r7
  * lost 7 queries to exactly this: the reader assumed one encoding and the
  * data arrived in another.
  *
  * This spec writes the SAME event rows in the three real-world parquet
  * shapes —
  *   - nanos-as-long  (how a TIMESTAMP(NANOS) file presents under
  *     `nanosAsLong`: an INT64 column, `LongType` to the dispatch)
  *   - TIMESTAMP_NTZ  (isAdjustedToUTC=false, MICROS)
  *   - TIMESTAMP_LTZ  (isAdjustedToUTC=true, MICROS)
  * — and runs the whole event-time query family over each fixture,
  * asserting identical results. On r7's reader the NTZ fixture fails with
  * DATATYPE_MISMATCH (`unix_micros` on TIMESTAMP_NTZ); this spec turns that
  * breakage class from driver-discovered into sbt-discovered.
  */
class EventsEncodingSpec extends AnyFunSuite {
  import TestSpark._

  /** Event-time family: every query whose plan reads `events.ts`. */
  private val family = Seq(
    "j5_asof_join", "j6_range_join", "l1_scd2", "l2_cdc_apply",
    "o7_latest_per_key", "w4_sessionize", "w8_forward_fill", "w9_funnel")

  /** sf0.001 with `events.parquet` re-encoded; all other tables symlinked.
    *
    * Fidelity note (ADVICE r8): the "nanos" fixture is a plain INT64
    * column, which is what a TIMESTAMP(NANOS) file PRESENTS AS once
    * `nanosAsLong` is active — it exercises the LongType dispatch branch
    * and the `div 1000` truncation, but not the annotated-NANOS read
    * itself (PARQUET_TYPE_ILLEGAL avoidance). Spark's parquet writer
    * cannot emit an annotated TIMESTAMP(NANOS) column (its outputTimestampType
    * options are INT96/MICROS/MILLIS), so that last step is only
    * exercisable against driver-generated files; the driver's sf tiers
    * have shipped genuine NANOS files and the oracle gate covers them.
    */
  private lazy val fixtures: Map[String, String] = {
    val canon = graft.lake.Tables.events(spark, sf) // ts: TimestampType (UTC)
    val variants = Map(
      "nanos" -> canon.withColumn("ts", unix_micros(col("ts")) * 1000L),
      "ntz"   -> canon.withColumn("ts", col("ts").cast(TimestampNTZType)),
      "ltz"   -> canon)
    variants.map { case (enc, df) =>
      val dir = Files.createTempDirectory(s"graft_enc_$enc").toString
      new java.io.File(s"$sf").listFiles().foreach { t =>
        if (t.getName != "events.parquet")
          Files.createSymbolicLink(
            Paths.get(dir, t.getName), t.toPath.toAbsolutePath)
      }
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      enc -> dir
    }
  }

  test("the three fixtures really carry three distinct scanned types") {
    val scanned = fixtures.map { case (enc, dir) =>
      enc -> spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    }
    assert(scanned("nanos") == LongType, s"nanos fixture: ${scanned("nanos")}")
    assert(scanned("ntz") == TimestampNTZType, s"ntz fixture: ${scanned("ntz")}")
    assert(scanned("ltz") == TimestampType, s"ltz fixture: ${scanned("ltz")}")
  }

  test("every event-time query returns identical rows on all three encodings") {
    family.foreach { name =>
      val byEnc = fixtures.map { case (enc, dir) =>
        enc -> SparkEntry.queries(name)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
      }
      assert(byEnc("nanos").nonEmpty, s"$name returned 0 rows")
      assert(byEnc("ntz") == byEnc("nanos"),
        s"$name: NTZ-micros result differs from nanos-long result")
      assert(byEnc("ltz") == byEnc("nanos"),
        s"$name: LTZ-micros result differs from nanos-long result")
    }
  }

  /** ADVICE r8: the NTZ→LTZ conversion and the bound literals must not
    * depend on the session timezone — a foreign (driver-owned) session
    * running with its host zone must read the same UTC instants the
    * pinned-UTC sessions do. Epoch micros are the TZ-independent
    * representation compared here; São Paulo (UTC-3, with a DST history)
    * is the reference's own locale.
    */
  test("a non-UTC session reads the same UTC instants on every encoding") {
    val tzKey = "spark.sql.session.timeZone"
    val orig = spark.conf.get(tzKey)
    def micros(dir: String): Seq[Long] =
      graft.lake.Tables.events(spark, dir)
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
    def boundedCount(dir: String): Long =
      graft.lake.Tables.eventsBetween(spark, dir,
        "2024-01-01 00:00:00", "2024-03-01 00:00:00").count()
    val truthMicros = fixtures.map { case (enc, dir) => enc -> micros(dir) }
    val truthCounts = fixtures.map { case (enc, dir) => enc -> boundedCount(dir) }
    try {
      spark.conf.set(tzKey, "America/Sao_Paulo")
      fixtures.foreach { case (enc, dir) =>
        assert(micros(dir) == truthMicros(enc),
          s"$enc: São-Paulo session shifted the read instants")
        assert(boundedCount(dir) == truthCounts(enc),
          s"$enc: São-Paulo session shifted the eventsBetween bounds")
      }
    } finally spark.conf.set(tzKey, orig)
  }

  test("eventsBetween pushes ts bounds to the scan on every encoding") {
    fixtures.foreach { case (enc, dir) =>
      val df = graft.lake.Tables.eventsBetween(spark, dir,
        "2024-01-01 00:00:00", "2024-03-01 00:00:00")
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      assert(scan.contains("PushedFilters:") &&
        scan.contains("GreaterThanOrEqual(ts,") && scan.contains("LessThan(ts,"),
        s"$enc: ts bounds not pushed to the events scan:\n$scan")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: eventsBetween output ts is not TimestampType")
    }
  }
}
