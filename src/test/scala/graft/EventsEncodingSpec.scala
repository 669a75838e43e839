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
    * Four shapes (ADVICE r8 closed): Spark's own writer cannot emit an
    * annotated TIMESTAMP(NANOS) column (outputTimestampType is
    * INT96/MICROS/MILLIS only), so the "nanos" fixture — a plain INT64 of
    * epoch nanos, what a NANOS file PRESENTS AS once `nanosAsLong` is
    * active — is joined by "nanos_real": a genuine
    * TIMESTAMP(isAdjustedToUTC=true, NANOS)-annotated file written with
    * parquet-mr directly, exercising the actual annotated-NANOS read path
    * (PARQUET_TYPE_ILLEGAL avoidance) that real driver-generated files
    * hit. Its rows carry a NON-ZERO sub-microsecond remainder so the
    * reader's `div 1000` truncation is load-bearing, not a no-op.
    */
  private lazy val fixtures: Map[String, String] = {
    val canon = graft.lake.Tables.events(spark, sf) // ts: TimestampType (UTC)
    val variants = Map(
      "nanos" -> canon.withColumn("ts", unix_micros(col("ts")) * 1000L),
      "ntz"   -> canon.withColumn("ts", col("ts").cast(TimestampNTZType)),
      "ltz"   -> canon)
    def freshDir(enc: String): String = {
      val dir = Files.createTempDirectory(s"graft_enc_$enc").toString
      new java.io.File(s"$sf").listFiles().foreach { t =>
        if (t.getName != "events.parquet")
          Files.createSymbolicLink(
            Paths.get(dir, t.getName), t.toPath.toAbsolutePath)
      }
      dir
    }
    val written = variants.map { case (enc, df) =>
      val dir = freshDir(enc)
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      enc -> dir
    }
    val realDir = freshDir("nanos_real")
    writeAnnotatedNanos(canon, s"$realDir/events.parquet")
    written + ("nanos_real" -> realDir)
  }

  /** Writes `events` with a genuine parquet TIMESTAMP(NANOS) `ts` via
    * parquet-mr's example writer (driver-side; sf0.001 is ~thousands of
    * rows). ts = epoch_micros·1000 + (event_id mod 1000): true nanosecond
    * payload whose truncation back to micros must reproduce the canon.
    */
  private def writeAnnotatedNanos(canon: org.apache.spark.sql.DataFrame,
      outDir: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    val schema = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    Files.createDirectories(Paths.get(outDir))
    val out = HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$outDir/part-00000.parquet"),
      spark.sparkContext.hadoopConfiguration)
    val writer = ExampleParquetWriter.builder(out).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try {
      canon.select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .collect().foreach { r =>
          val g = gf.newGroup()
          g.add("event_id", r.getLong(0))
          g.add("ts", r.getLong(1) * 1000L + (r.getLong(0) % 1000L))
          g.add("user_id", r.getLong(2))
          if (!r.isNullAt(3)) g.add("event_type", r.getString(3))
          if (!r.isNullAt(4)) g.add("value", r.getDouble(4))
          if (!r.isNullAt(5)) g.add("props", r.getString(5))
          writer.write(g)
        }
    } finally writer.close()
  }

  test("the three fixtures really carry three distinct scanned types") {
    val scanned = fixtures.map { case (enc, dir) =>
      enc -> spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    }
    assert(scanned("nanos") == LongType, s"nanos fixture: ${scanned("nanos")}")
    assert(scanned("ntz") == TimestampNTZType, s"ntz fixture: ${scanned("ntz")}")
    assert(scanned("ltz") == TimestampType, s"ltz fixture: ${scanned("ltz")}")
    assert(scanned("nanos_real") == LongType,
      s"nanos_real fixture: ${scanned("nanos_real")}")
  }

  test("the nanos_real fixture footer really carries TIMESTAMP(NANOS)") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val f = new java.io.File(s"${fixtures("nanos_real")}/events.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration))
    val ann = try {
      reader.getFooter.getFileMetaData.getSchema
        .getType(Array("ts"): _*).asPrimitiveType.getLogicalTypeAnnotation
    } finally reader.close()
    assert(ann != null && ann.toString.contains("TIMESTAMP") &&
      ann.toString.contains("NANOS"),
      s"ts annotation is $ann, expected TIMESTAMP(NANOS) — the fixture " +
        "no longer exercises the annotated-NANOS read path")
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
      assert(byEnc("nanos_real") == byEnc("nanos"),
        s"$name: annotated-NANOS result differs from nanos-long result")
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
