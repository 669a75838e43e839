package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, date_format, unix_micros}
import org.apache.spark.sql.types.{DataType, DateType, LongType, StringType,
  TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Date-encoding contract for `orders.o_orderdate` / `lineitem.l_shipdate`
  * (r8 verdict stretch #8 — generalizes [[EventsEncodingSpec]] beyond
  * `events.ts`).
  *
  * The date columns are written by the same upstream producer whose
  * timestamp encoding already flipped once (TIMESTAMP(NANOS) →
  * TIMESTAMP_NTZ between r7 and r8, costing 7 queries); today they ship as
  * TIMESTAMP(isAdjustedToUTC=false, MICROS). This spec writes the SAME
  * orders/lineitem rows in the five real-world shapes a regeneration could
  * plausibly pick —
  *   - ntz    TIMESTAMP(isAdjustedToUTC=false, MICROS)  (today; passthrough)
  *   - date   parquet DATE (information-preserving here: the values are
  *            midnight-aligned, asserted below — if a future tier gains
  *            time-of-day the DATE arm self-skips rather than fail on a
  *            fixture that cannot round-trip)
  *   - ltz    TIMESTAMP(isAdjustedToUTC=true, MICROS)
  *   - nanos  TIMESTAMP(NANOS) as it presents under `nanosAsLong`: INT64
  *            (same fidelity note as EventsEncodingSpec: Spark's writer
  *            cannot emit annotated NANOS; the LongType dispatch branch is
  *            what this exercises)
  *   - string `yyyy-MM-dd HH:mm:ss` wall-clock text
  * — and runs every date-reading query over each fixture, asserting
  * identical results. `Tables.datedTable` is the dispatch under test.
  */
class DatedEncodingSpec extends AnyFunSuite {
  import TestSpark._

  /** Every SparkEntry query whose plan reads o_orderdate or l_shipdate. */
  private val family = Seq(
    "w2_running_sum", "w6_range_rolling", "j7_full_outer", "o6_except",
    "f_date_funcs", "l3_incremental_agg", "l5_incremental_quantile",
    "v1_profile", "v5_benford")

  private val dated = Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")

  private def reencode(df: DataFrame, c: String, enc: String): DataFrame =
    enc match {
      case "ntz"    => df
      case "date"   => df.withColumn(c, col(c).cast(DateType))
      case "ltz"    => df.withColumn(c, col(c).cast(TimestampType))
      case "nanos"  => df.withColumn(c,
        unix_micros(col(c).cast(TimestampType)) * 1000L)
      case "string" => df.withColumn(c,
        date_format(col(c), "yyyy-MM-dd HH:mm:ss"))
    }

  // The session is pinned UTC (TestSpark), so NTZ→LTZ casts above are
  // instant-preserving by construction.
  private lazy val midnightAligned: Boolean = dated.forall { case (t, c) =>
    graft.lake.Tables.table(spark, sf, t)
      .filter(unix_micros(col(c).cast(TimestampType)) % (86400L * 1000000L)
        =!= 0L)
      .isEmpty
  }

  private lazy val encodings: Seq[String] =
    Seq("ntz", "ltz", "nanos", "string") ++
      (if (midnightAligned) Seq("date") else Seq.empty)

  /** sf0.001 with orders+lineitem re-encoded; all other tables symlinked. */
  private lazy val fixtures: Map[String, String] = encodings.map { enc =>
    val dir = Files.createTempDirectory(s"graft_dated_$enc").toString
    new java.io.File(sf).listFiles().foreach { t =>
      if (!dated.exists(_._1 + ".parquet" == t.getName))
        Files.createSymbolicLink(
          Paths.get(dir, t.getName), t.toPath.toAbsolutePath)
    }
    dated.foreach { case (t, c) =>
      reencode(graft.lake.Tables.table(spark, sf, t), c, enc)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    enc -> dir
  }.toMap

  private def scannedType(dir: String, t: String, c: String): DataType =
    spark.read.parquet(s"$dir/$t.parquet").schema(c).dataType

  test("the fixtures really carry distinct scanned types") {
    dated.foreach { case (t, c) =>
      assert(scannedType(fixtures("ntz"), t, c) == TimestampNTZType)
      assert(scannedType(fixtures("ltz"), t, c) == TimestampType)
      assert(scannedType(fixtures("nanos"), t, c) == LongType)
      assert(scannedType(fixtures("string"), t, c) == StringType)
      fixtures.get("date").foreach { d =>
        assert(scannedType(d, t, c) == DateType)
      }
    }
  }

  test("Tables normalizes every encoding to the canonical NTZ column") {
    fixtures.foreach { case (enc, dir) =>
      assert(graft.lake.Tables.orders(spark, dir)
        .schema("o_orderdate").dataType == TimestampNTZType,
        s"$enc: o_orderdate not normalized")
      assert(graft.lake.Tables.lineitem(spark, dir)
        .schema("l_shipdate").dataType == TimestampNTZType,
        s"$enc: l_shipdate not normalized")
    }
  }

  test("every date-reading query returns identical rows on all encodings") {
    family.foreach { name =>
      val byEnc = fixtures.map { case (enc, dir) =>
        enc -> SparkEntry.queries(name)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
      }
      assert(byEnc("ntz").nonEmpty, s"$name returned 0 rows")
      (encodings.toSet - "ntz").foreach { enc =>
        assert(byEnc(enc) == byEnc("ntz"),
          s"$name: $enc result differs from the canonical ntz result")
      }
    }
  }

  /** The normalized column is an NTZ wall clock — TZ-independent by type —
    * but the LTZ/nanos arms CONVERT through the session zone, so a foreign
    * (driver-owned, host-zone) session is where a wrong conversion would
    * surface. São Paulo per the reference's locale.
    */
  test("a non-UTC session reads the same wall clocks on every encoding") {
    val tzKey = "spark.sql.session.timeZone"
    val orig = spark.conf.get(tzKey)
    // Collect the NTZ values as LocalDateTime — NOT via date_format, which
    // type-coerces NTZ→LTZ through the SESSION zone and under São Paulo
    // bumps walls that fall in a DST spring-forward gap (+1h for the
    // 1996/1997/2000 Oct transition midnights) even when the column under
    // test is exactly right. The collected wall clock is the column's own
    // value, no formatting expression in the plan.
    def walls(dir: String): Seq[String] =
      graft.lake.Tables.orders(spark, dir)
        .select(col("o_orderdate"))
        .collect().map(_.getAs[java.time.LocalDateTime](0).toString)
        .sorted.toSeq
    val truth = fixtures.map { case (enc, dir) => enc -> walls(dir) }
    assert(truth.values.toSet.size == 1,
      "fixtures disagree before the TZ change — fixture bug, not a TZ bug")
    try {
      spark.conf.set(tzKey, "America/Sao_Paulo")
      fixtures.foreach { case (enc, dir) =>
        assert(walls(dir) == truth(enc),
          s"$enc: São-Paulo session shifted the normalized wall clocks")
      }
    } finally spark.conf.set(tzKey, orig)
  }

  test("today's encoding is a passthrough — the plan gains no projection") {
    val raw = spark.read.parquet(s"$sf/orders.parquet")
    val viaTables = graft.lake.Tables.orders(spark, sf)
    assert(raw.queryExecution.analyzed.schema ==
      viaTables.queryExecution.analyzed.schema)
    // identical logical plan class chain: no Project wrapper was added
    assert(viaTables.queryExecution.logical.getClass ==
      raw.queryExecution.logical.getClass,
      s"ntz passthrough added a node: ${viaTables.queryExecution.logical}")
  }
}
