package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Streaming slice (SURVEY §2.9 T1–T4) driven by MemoryStream and temp
  * dirs — no wall-clock sleeps: AvailableNow / processAllAvailable give
  * deterministic micro-batch boundaries.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("T1 tick source is a streaming plan with the tick schema") {
    val df = Streams.tickSource(spark, rowsPerSecond = 5)
    assert(df.isStreaming)
    assert(df.columns.sameElements(Array("data_hora", "preco_brl")))
  }

  test("tumblingAgg over MemoryStream: watermark finalizes windows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Double)]
    val in = ms.toDF().toDF("data_hora", "preco_brl")
    val agg = Streams.tumblingAgg(in, "data_hora", "preco_brl",
      window = "1 minute", lateness = "1 minute")
    val q = agg.writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      ms.addData((t("2024-01-01 00:00:10"), 10.0),
        (t("2024-01-01 00:00:40"), 20.0))
      q.processAllAvailable()
      // advance event time far enough that the first window's watermark
      // (window end + 1 min lateness) has passed -> window emitted
      ms.addData((t("2024-01-01 00:05:00"), 5.0))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 00:10:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(rows.contains(("2024-01-01 00:00:00.0", 2L, 30.0)),
        s"first window missing/wrong: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("T2 buffered sink delivers tick JSON records to the lake path") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Double)]
    val ticks = Streams.asTickJson(ms.toDF().toDF("data_hora", "preco_brl"))
    val out = tmp("t2out"); val ckp = tmp("t2ckp")
    ms.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 600123.45))
    // AvailableNow for test speed; production default is the 60 s
    // ProcessingTime trigger (Firehose's IntervalInSeconds=60)
    val q = Streams.bufferedSink(ticks, out, ckp,
      trigger = Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val lines = spark.read.text(out).collect().map(_.getString(0))
    assert(lines.length == 1)
    assert(lines.head ==
      """{"value":"{\"timestamp\":\"2024-01-01 12:00:00\",\"price\":600123.45}"}""")
    assert(new java.io.File(ckp).exists())
    // read side of K5: the delivered zone parses back to typed ticks
    val parsed = graft.streaming.Streams.parseTickJson(
      spark.read.json(out).selectExpr("value")).collect()
    assert(parsed.length == 1)
    assert(parsed.head == graft.model.BtcTick("2024-01-01 12:00:00", 600123.45))
  }

  test("T3 file-arrival stream processes each raw file exactly once across restarts") {
    val raw = tmp("t3raw"); val out = tmp("t3out"); val ckp = tmp("t3ckp")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v DOUBLE")
    def arrive(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 1.5)).toDF("id", "v")
        .write.mode("append").parquet(raw)
    def runOnce(): Unit = {
      val q = Streams.rawZoneStream(spark, schema, raw)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(60000) finally q.stop()
    }
    arrive(0 until 10); runOnce()
    assert(spark.read.parquet(out).count() == 10)
    arrive(10 until 15); runOnce()
    // 15, not 25: the checkpoint (the SQS/Lambda single-flight ledger)
    // prevents reprocessing the first batch's files
    assert(spark.read.parquet(out).count() == 15)
    assert(spark.read.parquet(out).agg(Map("id" -> "max")).head.getLong(0) == 14)
  }

  test("T4 status poll reports progress on an active query") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Int]
    val q = ms.toDF().writeStream.format("noop").queryName("t4q").start()
    try {
      ms.addData(1, 2, 3)
      assert(Streams.awaitProcessed(q))
      assert(Streams.statusOf(q).contains("t4q"))
      assert(q.isActive)
    } finally q.stop()
  }

  test("T4 awaitProcessed honors its timeout on a stuck query (r2 verdict #4)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Int]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val q = ms.toDF().writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        gate.await() // a hung sink: the batch never completes
      }.start()
    try {
      ms.addData(1)
      val t0 = System.nanoTime()
      assert(!Streams.awaitProcessed(q, timeoutMs = 1000),
        "awaitProcessed returned true while the batch was stuck")
      val waitedMs = (System.nanoTime() - t0) / 1e6
      assert(waitedMs >= 900, s"returned before the timeout: $waitedMs ms")
      // r3 review: tight-loop polling must RE-JOIN the one parked
      // poller, not accumulate a new blocked thread per call
      (1 to 3).foreach(_ => assert(!Streams.awaitProcessed(q, timeoutMs = 200)))
      import scala.jdk.CollectionConverters._
      val pollerThreads = Thread.getAllStackTraces.keySet.asScala
        .count(_.getName == s"graft-awaitProcessed-${q.id}")
      assert(pollerThreads == 1,
        s"expected one reused poller thread, found $pollerThreads")
    } finally { gate.countDown(); q.stop() }
  }

  test("streaming K3: foreachBatch appends micro-batches to the JDBC table") {
    implicit val sqlCtx = spark.sqlContext
    val url = {
      val dir = tmp("derby_stream")
      s"jdbc:derby:$dir/db;create=true"
    }
    graft.ingest.Jdbc.ensurePrecoBitcoinTable(url)
    val ms = MemoryStream[(Timestamp, Double)]
    val q = graft.streaming.Streams.jdbcSink(
      ms.toDF().toDF("data_hora", "preco_brl"),
      url, "preco_bitcoin", tmp("t5ckp")).start()
    try {
      ms.addData((Timestamp.valueOf("2025-08-01 10:00:00"), 600000.0))
      q.processAllAvailable()
      ms.addData((Timestamp.valueOf("2025-08-01 10:00:01"), 600100.0))
      q.processAllAvailable()
      val hist = graft.ingest.Jdbc
        .readOrderedDesc(spark, url, "preco_bitcoin", "ID").collect()
      assert(hist.length == 2)
      assert(hist.head.getDouble(2) == 600100.0) // newest first, DB-owned ids
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp, Double)]
    val deduped = Streams.dedupStream(
      ms.toDF().toDF("key", "ts", "value"), Seq("key"), "ts",
      lateness = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // same-batch duplicate + distinct key
      ms.addData(("a", t("2024-01-01 00:00:00"), 1.0),
        ("a", t("2024-01-01 00:00:01"), 2.0),
        ("b", t("2024-01-01 00:00:02"), 3.0))
      q.processAllAvailable()
      // cross-batch duplicate inside the watermark window -> dropped
      ms.addData(("a", t("2024-01-01 00:00:30"), 4.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 2, s"expected {a,b} once each: ${rows.mkString(", ")}")
      assert(rows.map(_.getString(0)).sorted.sameElements(Array("a", "b")))
      // state is bounded: the plan uses the watermark-evicting operator
      assert(q.lastProgress.stateOperators.exists(
        _.operatorName.contains("dedupe")),
        s"expected a dedupe state operator: ${q.lastProgress}")
    } finally q.stop()
  }

  test("enrichStream: in-interval refs join (with documented fan-out), no-ref ticks emit nothing, join state evicts") {
    implicit val sqlCtx = spark.sqlContext
    val ticks = MemoryStream[(String, Timestamp, Double)]
    val refs = MemoryStream[(String, Timestamp, Double)]
    val enriched = Streams.enrichStream(
      ticks.toDF().toDF("key", "ts", "value"),
      refs.toDF().toDF("key", "rts", "rate"),
      "key", "ts", "rts", lateness = "10 minutes", maxDelay = "1 hour")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      refs.addData(
        ("a", t("2024-01-01 09:30:00"), 1.5), // in interval for a@10:00
        ("a", t("2024-01-01 09:45:00"), 2.5), // also in interval -> fan-out
        ("b", t("2024-01-01 05:00:00"), 9.9)) // 5 h before b's tick -> outside maxDelay
      ticks.addData(
        ("a", t("2024-01-01 10:00:00"), 100.0),
        ("b", t("2024-01-01 10:00:00"), 200.0), // only an out-of-interval ref -> nothing
        ("c", t("2024-01-01 10:00:00"), 300.0)) // no ref at all -> nothing
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
      // the 'a' tick emits once per in-interval ref (documented multi-match contract)
      assert(rows.length == 2, s"expected a's two-ref fan-out only: ${rows.mkString(", ")}")
      assert(rows.forall(r => r.getString(0) == "a" && r.getDouble(2) == 100.0))
      assert(rows.map(_.getDouble(4)).sorted.sameElements(Array(1.5, 2.5)))
      // interval-bounded state: the operator is the symmetric hash join...
      val joinOp = q.lastProgress.stateOperators
        .find(_.operatorName.contains("symmetricHashJoin"))
      assert(joinOp.isDefined, s"expected a stream-stream join operator: ${q.lastProgress}")
      val before = joinOp.get.numRowsTotal
      // ...and advancing the watermark a day evicts the buffered day-1 rows
      ticks.addData(("z", t("2024-01-02 10:00:00"), 1.0))
      refs.addData(("z", t("2024-01-02 10:00:00"), 7.0))
      q.processAllAvailable()
      ticks.addData(("z", t("2024-01-02 10:00:05"), 2.0))
      refs.addData(("z", t("2024-01-02 10:00:05"), 8.0))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators
        .find(_.operatorName.contains("symmetricHashJoin")).get.numRowsTotal
      assert(after < before,
        s"join state did not shrink after the watermark passed day 1: $before -> $after")
    } finally q.stop()
  }

  test("enrichStreamLatest: ONE row per tick carrying the newest in-interval ref, after the watermark closes the tick") {
    implicit val sqlCtx = spark.sqlContext
    val ticks = MemoryStream[(String, Timestamp, Double)]
    val refs = MemoryStream[(String, Timestamp, Double)]
    val enriched = Streams.enrichStreamLatest(
      ticks.toDF().toDF("key", "ts", "value"),
      refs.toDF().toDF("key", "rts", "rate"),
      "key", "ts", "rts", lateness = "10 minutes", maxDelay = "1 hour")
    val q = enriched.writeStream.format("memory").queryName("enrich_latest_out")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      refs.addData(("a", t("2024-01-01 09:30:00"), 1.5),
        ("a", t("2024-01-01 09:45:00"), 2.5))
      ticks.addData(("a", t("2024-01-01 10:00:00"), 100.0))
      q.processAllAvailable()
      // append-mode agg holds the 10:00 group until the watermark passes
      assert(spark.table("enrich_latest_out").isEmpty,
        "group emitted before the watermark closed it")
      // advance both sides' watermarks past 10:00 + lateness
      ticks.addData(("a", t("2024-01-01 11:00:00"), 1.0))
      refs.addData(("a", t("2024-01-01 11:00:00"), 9.0))
      q.processAllAvailable()
      ticks.addData(("a", t("2024-01-01 12:00:00"), 1.0))
      refs.addData(("a", t("2024-01-01 12:00:00"), 9.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_latest_out").collect()
        .filter(_.getTimestamp(1) == t("2024-01-01 10:00:00"))
      assert(rows.length == 1,
        s"expected one reduced row for the 10:00 tick: ${rows.mkString(", ")}")
      val r = rows.head
      assert(r.getString(0) == "a" && r.getDouble(2) == 100.0)
      assert(r.getTimestamp(3) == t("2024-01-01 09:45:00")) // the LATEST in-interval ref
      assert(r.getDouble(4) == 2.5)
      // the chained-stateful shape: interval join + append-mode agg,
      // BOTH watermark-bounded state operators present
      val ops = q.lastProgress.stateOperators.map(_.operatorName)
      assert(ops.exists(_.contains("symmetricHashJoin")) &&
        ops.exists(_.contains("stateStoreSave")), // the streaming agg's operator
        s"expected join + aggregation state operators, got ${ops.mkString(", ")}")
    } finally q.stop()
  }

  test("deterministic sampling runs unchanged on a stream (stateless curation filter)") {
    // the content-keyed coin is a pure projection-filter, so the same
    // Sampling.deterministic call works on a streaming frame — and
    // selects exactly the rows its batch twin selects (same keys, same
    // coin), which a rand()-based sample cannot promise
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    val sampled = graft.ops.Sampling.deterministic(
      ms.toDF().toDF("doc_id"),
      org.apache.spark.sql.functions.col("doc_id"), 0.5, salt = "st")
    val q = sampled.writeStream.format("memory").queryName("sample_out")
      .outputMode("append").start()
    try {
      ms.addData(0L to 199L: _*)
      q.processAllAvailable()
      val streamed = spark.table("sample_out").collect().map(_.getLong(0)).toSet
      val batch = graft.ops.Sampling.deterministic(
        spark.range(200).toDF("doc_id"),
        org.apache.spark.sql.functions.col("doc_id"), 0.5, salt = "st")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch && streamed.nonEmpty,
        s"stream/batch sample mismatch: ${streamed.size} vs ${batch.size}")
      // stateless: no state store operator in the progress at all
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("frequentStream: bounded-state heavy hitters survive across batches with the MG guarantee") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val out = Streams.frequentStream(ms.toDS(), k = 3, shards = 2)
    val q = out.writeStream.format("memory").queryName("freq_out")
      .outputMode("complete").start()
    try {
      // batch 1: alpha is heavy (10 of 15)
      ms.addData(Seq.fill(10)("alpha") ++ Seq("b1", "b2", "b3") ++
        Seq.fill(2)("beta"): _*)
      q.processAllAvailable()
      // batch 2: NO alpha at all — a fresh per-batch sketch could not
      // contain it; only carried state can
      ms.addData(Seq.fill(8)("delta") ++ Seq("c1", "c2", "c3"): _*)
      q.processAllAvailable()
      val cands = spark.table("freq_out").collect()
        .flatMap(_.getSeq[String](1)).toSet
      // N = 26, k = 3: every key with total count > N/(k+1) = 6.5 is
      // GUARANTEED present (alpha 10, delta 8) — alpha's presence also
      // proves the sketch state carried across micro-batches
      assert(cands.contains("alpha"), s"alpha lost across batches: $cands")
      assert(cands.contains("delta"), s"delta missing: $cands")
      // state is bounded by the shard count, NOT the key domain
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty && st.head.numRowsTotal <= 2,
        s"state rows ${st.headOption.map(_.numRowsTotal)} exceed shard count")
    } finally q.stop()
  }

  test("mapGroupsWithState: per-key state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Double)]
    val out = Streams.runningUserStats(ms.toDS())
    val q = out.toDF("user", "n", "total")
      .writeStream.format("memory").queryName("user_stats")
      .outputMode("update").start()
    try {
      ms.addData(("u1", 10.0), ("u1", 5.0), ("u2", 1.0))
      q.processAllAvailable()
      ms.addData(("u1", 2.5), ("u3", 7.0))
      q.processAllAvailable()
      // memory sink in update mode appends updated rows; latest per key wins
      val latest = spark.table("user_stats").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest("u1") == ((3L, 17.5)))  // state carried across batches
      assert(latest("u2") == ((1L, 1.0)))
      assert(latest("u3") == ((1L, 7.0)))
    } finally q.stop()
  }

  test("latestPerKeyStream: late rows never regress the materialized current-row view") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Double)]
    val out = Streams.latestPerKeyStream(ms.toDS())
    val q = out.toDF("k", "ts", "seq", "v")
      .writeStream.format("memory").queryName("latest_view")
      .outputMode("update").start()
    try {
      // out-of-order WITHIN a batch: ts 20 then ts 10 — 20 must win
      ms.addData(("a", 20L, 1L, 2.0), ("a", 10L, 2L, 1.0), ("b", 5L, 3L, 9.9))
      q.processAllAvailable()
      // a LATE arrival (ts 15 < 20) must not regress a; equal-ts higher
      // seq must advance b
      ms.addData(("a", 15L, 4L, 7.0), ("b", 5L, 7L, 4.4))
      q.processAllAvailable()
      val view = spark.table("latest_view").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, vs) =>
          k -> vs.map(_._2).maxBy(v => (v._1, v._2)) }
      assert(view("a") == ((20L, 1L, 2.0)), "late row regressed the view")
      assert(view("b") == ((5L, 7L, 4.4)), "equal-ts higher-seq row did not advance")
      // the per-batch emission also never regressed: every update row for
      // a key is >= the previous one in (ts, seq) order
      val perKey = spark.table("latest_view").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1)
      perKey.values.foreach { vs =>
        vs.map(_._2).sliding(2).foreach {
          case Array(p, n) => assert(Ordering[(Long, Long)].lteq(p, n))
          case _ => ()
        }
      }
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: session emits only when the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Streams.SessionEvent
    val ms = MemoryStream[SessionEvent]
    val out = graft.streaming.Streams.sessionizeStream(
      ms.toDS(), gapSeconds = 1800, lateness = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      def ev(u: String, t: String, v: Double) =
        SessionEvent(u, Timestamp.valueOf(t), v)
      ms.addData(ev("u1", "2024-03-01 10:00:00", 1.0),
        ev("u1", "2024-03-01 10:00:10", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").isEmpty) // session still open
      // an event 2h later pushes the watermark past u1's gap timeout
      ms.addData(ev("u2", "2024-03-01 12:00:00", 5.0))
      q.processAllAvailable()
      ms.addData(ev("u2", "2024-03-01 12:00:01", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_out").as[graft.streaming.Streams.ClosedSession]
        .collect()
      assert(rows.length == 1, s"expected exactly u1's closed session: ${rows.mkString}")
      val s = rows.head
      assert(s.user == "u1" && s.n_events == 2 && s.total == 3.0)
      assert(s.start == Timestamp.valueOf("2024-03-01 10:00:00"))
      assert(s.end == Timestamp.valueOf("2024-03-01 10:00:10"))
    } finally q.stop()
  }

  test("sessionization state survives a query restart (state-store recovery)") {
    import spark.implicits._
    import graft.streaming.Streams.SessionEvent
    val src = tmp("recov_src"); val out = tmp("recov_out"); val ckp = tmp("recov_ckp")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user STRING, ts TIMESTAMP, value DOUBLE")
    def arrive(rows: (String, String, Double)*): Unit =
      rows.map { case (u, t, v) => (u, Timestamp.valueOf(t), v) }
        .toDF("user", "ts", "value")
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val events = spark.readStream.schema(schema).parquet(src)
        .as[SessionEvent]
      val q = graft.streaming.Streams
        .sessionizeStream(events, gapSeconds = 1800, lateness = "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    // run 1: open u1's session, stop the query (nothing emitted yet)
    arrive(("u1", "2024-03-01 10:00:00", 1.0), ("u1", "2024-03-01 10:00:10", 2.0))
    runOnce()
    // run 2: a NEW query on the same checkpoint sees a later event; the
    // restored state must close u1's session exactly once
    arrive(("u2", "2024-03-01 12:00:00", 5.0))
    runOnce()
    arrive(("u2", "2024-03-01 12:00:05", 1.0))
    runOnce()
    val sessions = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(sessions.count(_._1 == "u1") == 1,
      s"expected exactly one closed u1 session after restart: ${sessions.mkString}")
    assert(sessions.find(_._1 == "u1").get == (("u1", 2L, 3.0)))
  }

  test("hop windows: streaming matches batch and each event lands in size/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (Timestamp.valueOf("2024-02-01 10:00:05"), 1.0),
      (Timestamp.valueOf("2024-02-01 10:20:00"), 2.0),
      (Timestamp.valueOf("2024-02-01 11:00:00"), 4.0))
    val batch = Streams.hopAgg(
      data.toDF("ts", "value"), "ts", "value", stream = false)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // 2h/1h: every event is in exactly two windows
    assert(batch.toSeq.map(_._2).sum == 2 * data.length)
    val ms = MemoryStream[(Timestamp, Double)]
    val agg = Streams.hopAgg(ms.toDF().toDF("ts", "value"), "ts", "value")
    val q = agg.writeStream.format("memory").queryName("st_hop_both")
      .outputMode("complete").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("st_hop_both").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("session windows: streaming matches batch, including the exact-gap boundary") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (1L, Timestamp.valueOf("2024-02-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-02-01 10:30:00")), // merges (< 1h gap)
      (1L, Timestamp.valueOf("2024-02-01 11:30:00")), // EXACTLY 1h after -> still merges
      (1L, Timestamp.valueOf("2024-02-01 12:30:01")), // 1h + 1s -> new session
      (2L, Timestamp.valueOf("2024-02-01 09:00:00")))
    def shape(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    val batch = shape(Streams.sessionAgg(
      data.toDF("user_id", "ts"), "ts", "user_id", stream = false).collect())
    // inclusive-boundary merge: the exactly-1h event EXTENDS the first
    // session; only the 1h+1s event opens a second one
    assert(batch.count(_._1 == 1L) == 2, s"unexpected sessionization: $batch")
    assert(batch.exists(r => r._1 == 1L && r._4 == 3L),
      s"exact-gap event did not merge: $batch")
    assert(batch.count(_._1 == 2L) == 1)
    val ms = MemoryStream[(Long, Timestamp)]
    val agg = Streams.sessionAgg(ms.toDF().toDF("user_id", "ts"),
      "ts", "user_id")
    val q = agg.writeStream.format("memory").queryName("st_sess")
      .outputMode("complete").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      val streamed = shape(spark.table("st_sess").collect())
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("sj1 attribution window is inclusive at both ends") {
    // the oracle twin's contract: a purchase at EXACTLY the click time
    // and one at EXACTLY click + 1 h both attribute; 1 h + 1 s does not
    val clicks = Seq((1L, Timestamp.valueOf("2024-02-01 10:00:00")))
      .toDF("c_user", "c_ts")
    val buys = Seq(
      (1L, Timestamp.valueOf("2024-02-01 10:00:00"), 1.0),
      (1L, Timestamp.valueOf("2024-02-01 11:00:00"), 2.0),
      (1L, Timestamp.valueOf("2024-02-01 11:00:01"), 3.0))
      .toDF("b_user", "b_ts", "amount")
    val got = Streams.intervalJoin(clicks, buys, "c_user", "b_user",
        "c_ts", "b_ts", beforeSec = 0, afterSec = 3600, stream = false)
      .collect().map(_.getDouble(4)).toSet
    assert(got == Set(1.0, 2.0), s"boundary semantics drifted: $got")
  }

  test("stream-stream interval join matches the batch banded range join") {
    implicit val sqlCtx = spark.sqlContext
    // clicks and purchases: attribute a purchase to clicks by the same
    // user within [-60 s, +600 s] of the click
    val clicks = Seq(
      (1L, Timestamp.valueOf("2024-02-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-02-01 11:00:00")),
      (2L, Timestamp.valueOf("2024-02-01 10:05:00")))
    val buys = Seq(
      (1L, Timestamp.valueOf("2024-02-01 10:05:00"), 9.99), // joins click 1
      (1L, Timestamp.valueOf("2024-02-01 12:00:00"), 5.00), // joins nothing
      (2L, Timestamp.valueOf("2024-02-01 10:04:30"), 7.50)) // joins click 3 (before window)
    def shape(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(3),
        r.getDouble(4))).toSet
    val ms1 = MemoryStream[(Long, Timestamp)]
    val ms2 = MemoryStream[(Long, Timestamp, Double)]
    val joined = Streams.intervalJoin(
      ms1.toDF().toDF("c_user", "c_ts"),
      ms2.toDF().toDF("b_user", "b_ts", "amount"),
      "c_user", "b_user", "c_ts", "b_ts", beforeSec = 60, afterSec = 600)
    val q = joined.writeStream.format("memory").queryName("st_ij")
      .outputMode("append").start()
    try {
      // feed across two micro-batches: the join must buffer state
      ms1.addData(clicks: _*)
      q.processAllAvailable()
      ms2.addData(buys: _*)
      q.processAllAvailable()
      val streamed = shape(spark.table("st_ij").collect())
      val batch = shape(Streams.intervalJoin(
        clicks.toDF("c_user", "c_ts"), buys.toDF("b_user", "b_ts", "amount"),
        "c_user", "b_user", "c_ts", "b_ts", 60, 600, stream = false)
        .collect())
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(batch.size == 2)
      // and the batch banded range join computes the same pair set
      val banded = graft.ops.RangeJoin.banded(
        clicks.toDF("user_id", "c_ts"),
        buys.toDF("user_id", "b_ts", "amount"),
        "user_id", "c_ts", "b_ts", beforeSec = 60, afterSec = 600)
      assert(banded.count() == batch.size)
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows only after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val ms1 = MemoryStream[(Long, Timestamp)]
    val ms2 = MemoryStream[(Long, Timestamp, Double)]
    val joined = Streams.intervalJoin(
      ms1.toDF().toDF("c_user", "c_ts"),
      ms2.toDF().toDF("b_user", "b_ts", "amount"),
      "c_user", "b_user", "c_ts", "b_ts",
      beforeSec = 0, afterSec = 600, lateness = "10 seconds",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("st_oij")
      .outputMode("append").start()
    try {
      ms1.addData((1L, Timestamp.valueOf("2024-02-01 10:00:00")))
      ms2.addData((2L, Timestamp.valueOf("2024-02-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // no match yet, and the watermark hasn't proven none can arrive
      assert(spark.table("st_oij").isEmpty)
      // advance both watermarks far past the click's interval end
      ms1.addData((9L, Timestamp.valueOf("2024-02-01 12:00:00")))
      ms2.addData((9L, Timestamp.valueOf("2024-02-01 12:00:00"), 0.0))
      q.processAllAvailable()
      // one more batch: outer emission happens in the batch AFTER the
      // watermark update lands in the offset log
      ms2.addData((9L, Timestamp.valueOf("2024-02-01 12:00:01"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("st_oij").collect()
      val unmatched = rows.filter(r => r.getLong(0) == 1L)
      assert(unmatched.length == 1 && unmatched.head.isNullAt(4),
        s"user-1 click did not emit null-padded: ${rows.mkString(";")}")
    } finally q.stop()
  }

  test("st1 batch form and streaming form produce the same windows") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (Timestamp.valueOf("2024-02-01 10:00:05"), 1.0),
      (Timestamp.valueOf("2024-02-01 10:20:00"), 2.0),
      (Timestamp.valueOf("2024-02-01 11:00:00"), 4.0))
    // batch
    val batch = Streams.tumblingAgg(
      data.toDF("ts", "value"), "ts", "value", "1 hour", stream = false)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // stream (complete mode shows all windows without waiting for the
    // watermark; values must match the batch plan exactly)
    val ms = MemoryStream[(Timestamp, Double)]
    val agg = Streams.tumblingAgg(ms.toDF().toDF("ts", "value"),
      "ts", "value", "1 hour")
    val q = agg.writeStream.format("memory").queryName("st1_both")
      .outputMode("complete").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("st1_both").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("quotaPerKeyStream: per-key cap holds ACROSS micro-batches; under-quota keys flow through") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val out = Streams.quotaPerKeyStream(ms.toDS(), quota = 3)
    val q = out.toDF("k", "seq")
      .writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      // batch 1: hot key exceeds quota inside one batch; cold key under
      ms.addData(("hot", 1L), ("hot", 2L), ("hot", 3L), ("hot", 4L),
        ("cold", 1L))
      q.processAllAvailable()
      // batch 2: hot is already exhausted — NOTHING more admits; cold
      // fills up to its cap
      ms.addData(("hot", 5L), ("cold", 2L), ("cold", 3L), ("cold", 4L))
      q.processAllAvailable()
      val admitted = spark.table("quota_out").collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val byKey = admitted.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      assert(byKey("hot") == Set(1L, 2L, 3L),
        s"hot key must admit exactly its first 3 rows: ${byKey("hot")}")
      assert(byKey("cold") == Set(1L, 2L, 3L),
        s"cold key must fill its quota across batches: ${byKey("cold")}")
      assert(admitted.length == 6)
    } finally q.stop()
  }

  test("adjacencyStream: streamed co-order adjacency equals batch rebuild across 3 micro-batches; replay is idempotent (r12 verdict stretch #10)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val base = tmp("adjstream")
    val deltaPath = s"$base/delta"
    // (l_orderkey, l_partkey) rows; whole orders per batch, disjoint
    // order keys across batches — the documented CDC grain
    val ms = MemoryStream[(Long, Long)]
    val li = ms.toDF().toDF("l_orderkey", "l_partkey")
    val q = Streams.adjacencyStream(li, deltaPath, s"$base/ckpt").start()
    def merged(): Seq[(Long, Long, Long)] =
      Streams.streamedAdjacency(spark, deltaPath)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def parity(): Unit = {
      val want = graft.queries.Graph.coOrderWeightedFrom(
          all.toSeq.toDF("l_orderkey", "l_partkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(merged() == want,
        s"streamed adjacency diverged from the batch rebuild")
    }
    try {
      // batch 0: orders 1 (parts 10,20,30) and 2 (parts 10,20)
      val b0 = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L))
      ms.addData(b0: _*); all ++= b0
      q.processAllAvailable(); parity()
      // batch 1: order 3 repeats the (10,20) pair — weights must MERGE
      // across batches, not collide
      val b1 = Seq((3L, 10L), (3L, 20L), (3L, 40L))
      ms.addData(b1: _*); all ++= b1
      q.processAllAvailable(); parity()
      assert(merged().contains((10L, 20L, 3L)),
        "cross-batch weight merge failed for the repeated pair")
      // batch 2: an order with a duplicate line (collect_set dedups)
      val b2 = Seq((4L, 50L), (4L, 50L), (4L, 60L))
      ms.addData(b2: _*); all ++= b2
      q.processAllAvailable(); parity()

      // replay idempotency: re-drive batch 1's exact body with its
      // original batch id — the partition overwrites itself
      val before = merged()
      Streams.adjacencyBatch(deltaPath)(
        b1.toDF("l_orderkey", "l_partkey"), 1L)
      assert(merged() == before, "replayed batch changed the adjacency")
    } finally q.stop()
  }

  test("joinViewStream: sequential maintenance equals the one-shot join; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val base = tmp("jview")
    val (statePath, viewPath) = (s"$base/state", s"$base/view")
    // multiplexed CDC rows: (side, k, oval, cval) — the unused side's
    // payload column rides along and is projected away per side
    val ms = MemoryStream[(String, Long, Long, Long)]
    val updates = ms.toDF().toDF("side", "k", "oval", "cval")
    val q = Streams.joinViewStream(updates, statePath, viewPath,
      s"$base/ckpt", "k", Seq("oval"), Seq("cval")).start()
    def viewRows(): Seq[(Long, Long, Long)] =
      spark.read.parquet(viewPath).select("k", "oval", "cval")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    try {
      // batch 0: one fact + its dim row
      ms.addData(("a", 1L, 10L, 0L), ("b", 1L, 0L, 100L))
      q.processAllAvailable()
      assert(viewRows() == Seq((1L, 10L, 100L)))
      // batch 1: two fact deltas — one matches existing dim state,
      // one has no dim partner yet
      ms.addData(("a", 1L, 11L, 0L), ("a", 2L, 20L, 0L))
      q.processAllAvailable()
      assert(viewRows() == Seq((1L, 10L, 100L), (1L, 11L, 100L)))
      // batch 2: dim deltas — one backfills k=2, one adds a second
      // dim row for k=1 (must pair with BOTH k=1 fact-state rows)
      ms.addData(("b", 2L, 0L, 200L), ("b", 1L, 0L, 101L))
      q.processAllAvailable()
      val got = viewRows()
      // parity: maintained view == one-shot join of everything streamed
      val allA = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "oval")
      val allB = Seq((1L, 100L), (2L, 200L), (1L, 101L)).toDF("k", "cval")
      val want = allA.join(allB, "k").select("k", "oval", "cval")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(got == want, s"maintained view diverged: $got vs $want")

      // replay idempotency: re-drive batch 1's exact body with its
      // original batch id — every partition overwrites itself and the
      // view is bit-identical
      val replay = Seq(("a", 1L, 11L, 0L), ("a", 2L, 20L, 0L))
        .toDF("side", "k", "oval", "cval")
      Streams.joinViewBatch(spark, statePath, viewPath, "k",
        Seq("oval"), Seq("cval"))(replay, 1L)
      assert(viewRows() == want, "replayed batch changed the view")
      val stateA = spark.read.parquet(s"$statePath/a")
        .select("k", "oval").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(stateA == Seq((1L, 10L), (1L, 11L), (2L, 20L)),
        s"replayed batch changed the fact state: $stateA")

      // ---- batch_id-store lifecycle over the SAME stores (r17): a
      // store only gets a partition for batches that carried its
      // side's rows, so grow state/a to 3 partitions first
      ms.addData(("a", 3L, 30L, 0L)) // batch 3: fact with no dim yet
      q.processAllAvailable()
      q.stop()
      assert(Streams.batchIdStoreParts(spark, s"$statePath/a")
        == Seq(0L, 1L, 3L))
      assert(Streams.batchIdStoreParts(spark, s"$statePath/b")
        == Seq(0L, 2L))
      // under 3 partitions: nothing worth folding — refuse
      assert(!Streams.compactBatchIdStore(spark, s"$statePath/b"))
      // fold the fact state and the view between micro-batches
      assert(Streams.compactBatchIdStore(spark, s"$statePath/a"))
      assert(Streams.batchIdStoreParts(spark, s"$statePath/a")
        == Seq(1L, 3L))
      assert(Streams.batchIdStoreParts(spark, viewPath) == Seq(0L, 1L, 2L))
      assert(Streams.compactBatchIdStore(spark, viewPath))
      assert(Streams.batchIdStoreParts(spark, viewPath) == Seq(1L, 2L))
      assert(viewRows() == want, "compaction changed the view rows")
      val q2 = Streams.joinViewStream(updates, statePath, viewPath,
        s"$base/ckpt", "k", Seq("oval"), Seq("cval")).start()
      try {
        // batch 4 against the folded states: dim deltas that must pair
        // with EVERY matching fact-state row, folded or not
        ms.addData(("b", 1L, 0L, 102L), ("b", 3L, 0L, 300L))
        q2.processAllAvailable()
        assert(q2.exception.isEmpty, s"restarted stream died: ${q2.exception}")
        val allA2 = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
          .toDF("k", "oval")
        val allB2 = Seq((1L, 100L), (2L, 200L), (1L, 101L), (1L, 102L),
          (3L, 300L)).toDF("k", "cval")
        val want2 = allA2.join(allB2, "k").select("k", "oval", "cval")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq.sorted
        assert(viewRows() == want2,
          "view diverged from the one-shot join across a compaction")
      } finally q2.stop()
    } finally q.stop()
  }
}
