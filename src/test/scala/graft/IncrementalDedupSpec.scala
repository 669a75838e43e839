package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.Tables
import graft.text.Dedup

/** admitIncrement: the daily-increment admission workflow — dups of the
  * corpus rejected, intra-increment dups resolved to one survivor,
  * fresh docs admitted; equivalent to the full-recompute answer on a
  * curated corpus; and the corpus is probed via a broadcast of the
  * increment, never self-joined.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  import TestSpark._

  // a curated (near-deduped) corpus, as the contract assumes
  private lazy val corpus =
    Dedup.dropNearDuplicates(Tables.documents(spark, sf)).cache()

  // increment: two exact copies of corpus docs (near-dup of corpus),
  // two fresh docs, and an intra-increment duplicated pair
  private lazy val increment = {
    val base = 1000000L
    val copies = corpus.orderBy("doc_id").limit(2)
      .select((col("doc_id") + base).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    import spark.implicits._
    val fresh = Seq(
      (base + 501, "completely novel payload alpha beta gamma delta epsilon zeta"),
      (base + 502, "another unseen document with its own distinct run of tokens here"),
      (base + 503, "twin content twin content twin content twin content twin content"),
      (base + 504, "twin content twin content twin content twin content twin content"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("inc"))
      .withColumn("n_chars", length(col("text")))
    copies.unionByName(fresh)
  }

  test("corpus dups rejected, intra-increment dups collapse, fresh admitted") {
    val admitted = Dedup.admitIncrement(corpus, increment)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1000501L, 1000502L, 1000503L))
  }

  test("matches the full-recompute answer on a curated corpus") {
    val full = Dedup.dropNearDuplicates(corpus.unionByName(increment))
      .filter(col("doc_id") >= 1000000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val inc = Dedup.admitIncrement(corpus, increment)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(inc == full)
  }

  test("a persisted band index gives the same admissions") {
    val idx = Dedup.bandIndex(corpus).cache()
    try {
      val a = Dedup.admitIncrement(corpus, increment)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val b = Dedup.admitIncrement(corpus, increment, corpusBands = Some(idx))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a == b)
    } finally { idx.unpersist(); () }
  }

  test("admitStream: per-batch admission with cross-batch self-dedup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("admit").toString
    val corpusDoc = corpus.orderBy("doc_id").limit(1)
      .select("text").head().getString(0)
    val ms = MemoryStream[(Long, String)]
    val docsStream = ms.toDF().toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("stream"))
      .withColumn("n_chars", length(col("text")))
    val q = graft.streaming.Streams.admitStream(
      docsStream, corpus, s"$base/admitted", s"$base/ckpt").start()
    try {
      val freshA = "entirely new streaming document payload one two three four five"
      // batch 1: a corpus dup (reject) + a fresh doc (admit)
      ms.addData((2000001L, corpusDoc), (2000002L, freshA))
      q.processAllAvailable()
      // batch 2: a dup of batch 1's admitted doc (reject) + fresh (admit)
      ms.addData((2000003L, freshA),
        (2000004L, "a second novel stream document six seven eight nine ten"))
      q.processAllAvailable()
      val admitted = spark.read.parquet(s"$base/admitted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == Set(2000002L, 2000004L))
    } finally q.stop()
  }

  test("decontaminateStream: streamed flags across 3 batches ≡ batch d14; replayed batch idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.Winnowing
    val base = java.nio.file.Files.createTempDirectory("decon_stream").toString
    val docs = Tables.documents(spark, sf).localCheckpoint()
    val train = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").localCheckpoint()
    val bench = docs.filter(col("doc_id") % 2 === 1).localCheckpoint()

    // the batch twin this must match, flag for flag
    val want = Winnowing.decontaminate(train, bench)
      .collect().map(_.toString).toSet
    assert(want.nonEmpty, "fixture: the parity split flags nothing")

    val chunks = (0 until 3).map(i =>
      train.filter(pmod(col("doc_id"), lit(3)) === i)
        .collect().map(r => (r.getLong(0), r.getString(1))))
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.decontaminateStream(
      ms.toDF().toDF("doc_id", "text"), bench,
      s"$base/flagged", s"$base/ckpt").start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      def flagged(): Set[String] = spark.read.parquet(s"$base/flagged")
        .drop("batch_id").collect().map(_.toString).toSet
      assert(flagged() == want,
        "streamed flags != batch decontamination on the same split")

      // replay: re-drive batch 1's body under its own batch_id — the
      // dynamic partition overwrite must leave the store unchanged
      val bf = Winnowing.normalizedFingerprints(bench).localCheckpoint()
      graft.streaming.Streams.decontaminateBatch(
          chunks(1).toSeq.toDF("doc_id", "text"), bf, 3L)
        .withColumn("batch_id", lit(1L))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(s"$base/flagged")
      assert(flagged() == want, "a replayed batch changed the store")
    } finally q.stop()
  }

  test("spanScreenStream: streamed coverage across 3 batches ≡ screenIncrement off the served index; replayed batch idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.SubstringDedup
    val base = java.nio.file.Files.createTempDirectory("span_stream").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").localCheckpoint()
    val n = docs.count()
    val cut = 4L * n / 5L
    docs.filter(col("doc_id") < cut)
      .write.parquet(s"$base/documents.parquet")
    // the stream must ride the persisted table, not an inline rebuild
    SubstringDedup.persistOccurrenceIndex(spark, base, buckets = 4)
    try {
      assert(SubstringDedup.servedOccurrences(spark, base).nonEmpty)
      val incoming = docs.filter(col("doc_id") >= cut).localCheckpoint()
      val chunks = (0 until 3).map(i =>
        incoming.filter(pmod(col("doc_id"), lit(3)) === i)
          .collect().map(r => (r.getLong(0), r.getString(1))))
      // the batch twin, CUMULATIVE (r16 fold-forward): batch i screens
      // against corpus ∪ occurrences of batches < i's ADMITTED docs
      val corpusOcc = SubstringDedup.occurrencesOf(
        spark.read.parquet(s"$base/documents.parquet"))
      var against = corpusOcc
      val states = scala.collection.mutable.ArrayBuffer(against)
      val wantPerBatch = chunks.map { c =>
        val df = c.toSeq.toDF("doc_id", "text")
        val screened = SubstringDedup.screenIncrement(against, df)
          .localCheckpoint()
        val admitted = df.join(
          screened.filter(col("admit")).select("doc_id"), "doc_id")
        against = against.unionByName(
          SubstringDedup.occurrencesOf(admitted).localCheckpoint())
        states += against
        screened.collect().map(_.toString).toSet
      }
      val want = wantPerBatch.flatten.toSet
      assert(want.nonEmpty, "fixture produced no screen rows")

      val ms = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.spanScreenStream(
        ms.toDF().toDF("doc_id", "text"), base,
        s"$base/flagged", s"$base/ckpt").start()
      try {
        chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
        assert(q.exception.isEmpty, s"stream died: ${q.exception}")
        def flagged(): Set[String] = spark.read.parquet(s"$base/flagged")
          .drop("batch_id").collect().map(_.toString).toSet
        assert(flagged() == want,
          "streamed span screen != cumulative per-batch screenIncrement")

        // replay batch 1's body under its own batch_id against the
        // post-batch-0 state — dynamic partition overwrite must leave
        // the store unchanged (a replayed batch is a pure function of
        // the corpus and its PREDECESSORS, not of later batches)
        SubstringDedup.screenIncrement(states(1),
            chunks(1).toSeq.toDF("doc_id", "text"))
          .withColumn("batch_id", lit(1L))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$base/flagged")
        assert(flagged() == want, "a replayed batch changed the store")
      } finally q.stop()
    } finally SubstringDedup.dropOccurrenceIndex(spark, base)
  }

  test("spanScreenStream: screened ≡ cumulative across a mid-stream side-store compaction (r16 verdict #4)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.SubstringDedup
    import graft.streaming.Streams
    val base = java.nio.file.Files.createTempDirectory("span_compact").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").localCheckpoint()
    val n = docs.count()
    val cut = 3L * n / 5L
    docs.filter(col("doc_id") < cut)
      .write.parquet(s"$base/documents.parquet")
    val incoming = docs.filter(col("doc_id") >= cut).localCheckpoint()
    val chunks = (0 until 4).map(i =>
      incoming.filter(pmod(col("doc_id"), lit(4)) === i)
        .collect().map(r => (r.getLong(0), r.getString(1))))
    // the uncompacted batch twin: batch i screens against
    // corpus ∪ occurrences of batches < i's admitted docs
    var against = SubstringDedup.occurrencesOf(
      spark.read.parquet(s"$base/documents.parquet")).localCheckpoint()
    val want = chunks.flatMap { c =>
      val df = c.toSeq.toDF("doc_id", "text")
      val screened = SubstringDedup.screenIncrement(against, df)
        .localCheckpoint()
      val admitted = df.join(
        screened.filter(col("admit")).select("doc_id"), "doc_id")
      against = against.unionByName(
        SubstringDedup.occurrencesOf(admitted).localCheckpoint())
      screened.collect().map(_.toString)
    }.toSet
    assert(want.nonEmpty, "fixture produced no screen rows")

    val flaggedPath = s"$base/flagged"
    val ms = MemoryStream[(Long, String)]
    def startStream() = Streams.spanScreenStream(
      ms.toDF().toDF("doc_id", "text"), base, flaggedPath,
      s"$base/ckpt").start()
    val q = startStream()
    val q2 = try {
      (0 until 3).foreach { i =>
        ms.addData(chunks(i).toSeq); q.processAllAvailable()
      }
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      q.stop()
      // between micro-batches: 3 partitions → fold 0,1 into key 1
      assert(Streams.spanScreenStoreParts(spark, flaggedPath) ==
        Seq(0L, 1L, 2L))
      assert(Streams.compactSpanScreenStore(spark, flaggedPath),
        "compaction refused a 3-partition store")
      assert(Streams.spanScreenStoreParts(spark, flaggedPath) ==
        Seq(1L, 2L), "fold did not land as [foldKey, newest]")
      // the listing trigger: at the default threshold 2 partitions are
      // no debt; a threshold of 1 re-triggers but a 2-partition store
      // has nothing worth folding
      assert(!Streams.maintainSpanScreenStore(spark, flaggedPath))
      assert(!Streams.maintainSpanScreenStore(spark, flaggedPath,
        maxParts = 1))
      // restart the stream off the same checkpoint and run batch 3
      // against the folded store
      val qq = startStream()
      ms.addData(chunks(3).toSeq); qq.processAllAvailable()
      assert(qq.exception.isEmpty, s"restarted stream died: ${qq.exception}")
      qq
    } catch { case e: Throwable => q.stop(); throw e }
    try {
      val got = spark.read.parquet(flaggedPath)
        .drop("batch_id").collect().map(_.toString).toSet
      assert(got == want,
        "screened across a compaction != cumulative batch screening")
    } finally q2.stop()
  }

  test("spanScreenStream: screened ≡ cumulative across a corpus re-persist + promote (r16 verdict #4)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.SubstringDedup
    import graft.streaming.Streams
    val base = java.nio.file.Files.createTempDirectory("span_promote").toString
    // small controlled corpus + stream fixture
    Seq((0L, "c1 c2 c3 c4 c5 c6 c7"))
      .toDF("doc_id", "text").write.parquet(s"$base/documents.parquet")
    val flaggedPath = s"$base/flagged"
    val b0 = Seq((100L, "q1 q2 q3 q4 q5 q6"))          // novel, admitted
    val b1 = Seq((101L, "r1 r2 r3 r4 r5 r6"))          // novel, admitted
    // batch 2 (post-promote): one repeat of b0's text (must flag via
    // the CORPUS side after the rebuild) + one genuinely novel doc
    val b2 = Seq((102L, "q1 q2 q3 q4 q5 q6"),
      (103L, "s1 s2 s3 s4 s5 s6"))
    val ms = MemoryStream[(Long, String)]
    def startStream() = Streams.spanScreenStream(
      ms.toDF().toDF("doc_id", "text"), base, flaggedPath,
      s"$base/ckpt").start()
    val q = startStream()
    try {
      ms.addData(b0); q.processAllAvailable()
      ms.addData(b1); q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
    } finally q.stop()
    assert(Streams.spanScreenStoreParts(spark, flaggedPath) == Seq(0L, 1L))

    // corpus rebuild: fold the admitted docs of batches ≤ 1 into the
    // corpus itself (the orchestrator's move), then promote — their
    // side-store partitions are now redundant with the corpus side
    val admittedIds = spark.read.parquet(flaggedPath)
      .filter(col("admit")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admittedIds == Set(100L, 101L), s"fixture drift: $admittedIds")
    val rebuilt = spark.read.parquet(s"$base/documents.parquet")
      .unionByName(Seq(b0.head, b1.head).toDF("doc_id", "text"))
      .localCheckpoint()
    rebuilt.write.mode("overwrite").parquet(s"$base/documents.parquet")
    assert(Streams.promoteSpanScreenStore(spark, flaggedPath, 1L) == 2)
    assert(Streams.spanScreenStoreParts(spark, flaggedPath).isEmpty)

    // restart off the same checkpoint: batch 2 screens against the
    // REBUILT corpus only — and must match the batch twin exactly
    val q2 = startStream()
    try {
      ms.addData(b2); q2.processAllAvailable()
      assert(q2.exception.isEmpty, s"restarted stream died: ${q2.exception}")
      val want = SubstringDedup.screenIncrement(
          SubstringDedup.occurrencesOf(rebuilt),
          b2.toDF("doc_id", "text"))
        .collect().map(_.toString).toSet
      val got = spark.read.parquet(flaggedPath)
        .filter(col("batch_id") === 2L).drop("batch_id")
        .collect().map(_.toString).toSet
      assert(got == want,
        "screened after promote != batch screening against the rebuilt corpus")
      // the duplicate flags through the corpus side; the novel admits
      val admit = spark.read.parquet(flaggedPath)
        .filter(col("batch_id") === 2L)
        .select("doc_id", "admit").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(admit == Map(102L -> false, 103L -> true), admit.toString)
    } finally q2.stop()
  }

  test("spanScreenStream: a span admitted in batch 0 and repeated in batch 2 is flagged (cross-batch memory)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.SubstringDedup
    val base = java.nio.file.Files.createTempDirectory("span_xbatch").toString
    // corpus shares nothing with the stream fixture
    Seq((0L, "c1 c2 c3 c4 c5 c6 c7"))
      .toDF("doc_id", "text")
      .write.parquet(s"$base/documents.parquet")
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.spanScreenStream(
      ms.toDF().toDF("doc_id", "text"), base,
      s"$base/flagged", s"$base/ckpt").start()
    try {
      // batch 0: novel doc — admitted, folded forward
      ms.addData(Seq((100L, "q1 q2 q3 q4 q5 q6")))
      q.processAllAvailable()
      // batch 1: unrelated novel doc (the gap batch)
      ms.addData(Seq((101L, "r1 r2 r3 r4 r5 r6")))
      q.processAllAvailable()
      // batch 2: exact repeat of batch 0's text under a new id — the
      // r15 posture (corpus frozen at stream start) flagged NOTHING
      // here; the fold-forward must flag every token
      ms.addData(Seq((102L, "q1 q2 q3 q4 q5 q6")))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      val rows = spark.read.parquet(s"$base/flagged")
        .select("doc_id", "covered_tokens", "coverage_bp", "admit")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert(rows(100L) == ((0L, 0L, true)), "batch-0 doc must pass clean")
      assert(rows(101L) == ((0L, 0L, true)), "gap-batch doc must pass clean")
      assert(rows(102L) == ((6L, 10000L, false)),
        s"cross-batch duplicate not fully flagged: ${rows(102L)}")
    } finally q.stop()
  }

  test("admitStream survives an all-rejected first batch (schema-pinned read)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("admit0").toString
    val corpusDoc = corpus.orderBy("doc_id").limit(1)
      .select("text").head().getString(0)
    val ms = MemoryStream[(Long, String)]
    val docsStream = ms.toDF().toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("stream"))
      .withColumn("n_chars", length(col("text")))
    val q = graft.streaming.Streams.admitStream(
      docsStream, corpus, s"$base/admitted", s"$base/ckpt").start()
    try {
      // batch 1: ONLY a corpus dup -> nothing admitted, store dir
      // created with no parquet footers
      ms.addData((3000001L, corpusDoc))
      q.processAllAvailable()
      // batch 2 must still run (an inferring read of the empty store
      // throws and would crash-loop the stream)
      ms.addData((3000002L, "post empty batch this novel doc must be admitted fine"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      val admitted = spark.read.parquet(s"$base/admitted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == Set(3000002L))
    } finally q.stop()
  }

  test("leakage-safe split: near-dup pairs NEVER straddle splits; per-doc splitting does") {
    val docs = Tables.documents(spark, sf)
    val split = Dedup.t18LeakageSafeSplit(spark, sf)
      .select("doc_id", "split")
    // every candidate pair (superset of the verified near-dups) must
    // land in one split
    val pairs = Dedup.candidatePairsFor(docs)
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), "doc_a")
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling == 0, s"$straddling near-dup pairs straddle splits")
    // the contrast: the SAME coin keyed per-doc DOES leak on this corpus
    val perDoc = graft.ops.Sampling.deterministic(
      docs, col("doc_id"), 0.8, salt = "split")
    val leaky = pairs
      .join(perDoc.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(docs.select(col("doc_id").as("doc_b"))
        .exceptAll(perDoc.select(col("doc_id").as("doc_b"))),
        Seq("doc_b"), "left_semi").count()
    assert(leaky > 0, "corpus has no straddling pairs under per-doc split; contrast test vacuous")
    // all three splits exist and cover the corpus exactly once
    assert(split.count() == docs.count())
    assert(split.select("split").distinct().count() == 3)
  }

  test("the corpus index is probed via broadcast, not self-joined") {
    val cand = org.apache.spark.sql.functions.broadcast(
      Dedup.bandIndex(increment).as("i"))
      .join(Dedup.bandIndex(corpus).as("c"),
        col("i.band") === col("c.band") && col("i.bk") === col("c.bk"))
    cand.write.format("noop").mode("overwrite").save()
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case other => other.children.flatMap(walk)
      }
      p +: kids
    }
    val nodes = walk(cand.queryExecution.executedPlan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"increment bands should broadcast:\n${cand.queryExecution.executedPlan}")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]))
  }
}
