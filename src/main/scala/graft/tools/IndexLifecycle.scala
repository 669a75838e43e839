package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-index accounting (r8 verdict "What's missing #2"): the r8
  * memoization made every s2/s3/s9/s10/s11/d13 bench number a
  * WARM-index number. This tool measures, per corpus tier:
  *
  *   - cold build+materialize time of the LSH bucket index and the
  *     curated band index (via [[graft.lake.CorpusIndexCache.invalidate]],
  *     the same path a corpus rewrite triggers),
  *   - warm probe time of their cheapest consumers (s10 hard-negative
  *     fetch; d13 incremental admission),
  *   - the brute-force per-probe alternative (s1 exact top-k — the
  *     query shape s10 answers without an index),
  *
  * and reports the probe-count break-even N* = build / (brute − warm):
  * the number of index probes after which building the index beats
  * brute-scanning per query. Negative/absent N* means brute wins at
  * that tier (record it honestly — the index is a 100 TB artifact, not
  * a small-tier win; r7's s10 "regression" was exactly this trade).
  *
  *   sbt "runMain graft.tools.IndexLifecycle /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object IndexLifecycle {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_lifecycle_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(name: String, d: String): Unit =
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    def min3(f: => Double): Double = Seq(f, f, f).min

    // JIT warmup on the tiny tier
    Seq("s10_hard_negatives", "s1_cosine_topk", "d13_incremental_admit")
      .foreach(n => try noop(n, "/root/testdata/sf0.01") catch { case _: Throwable => () })

    val rows = dirs.map { d =>
      graft.sim.Similarity.bucketIndexCache.invalidate(s"$d/embeddings.parquet")
      val coldBucket = time { // build + materialize via first consumer
        graft.sim.Similarity.bucketTable(spark, d).count()
      }
      val warmS10 = min3(time(noop("s10_hard_negatives", d)))
      val brute = min3(time(noop("s1_cosine_topk", d)))

      graft.text.Dedup.corpusBandIndexCache.invalidate(s"$d/documents.parquet")
      val coldD13 = time(noop("d13_incremental_admit", d))
      val warmD13 = min3(time(noop("d13_incremental_admit", d)))

      val breakeven =
        if (brute > warmS10) math.ceil(coldBucket / (brute - warmS10)).toInt
        else -1

      // table-backed restart path (r10, verdict #2): cold-SESSION first
      // probe with no persisted table (cache build + probe) vs with the
      // bucketed index table present (scan-served, no build). Each
      // newSession has an empty CorpusIndexCache — the restart analogue
      // local mode can express. breakeven_restarts = table-write cost /
      // per-restart saving: how many session restarts amortize
      // persisting the index as a table.
      graft.lake.IndexTables.drop(spark, "annf", s"$d/embeddings.parquet")
      def s2In(sess: SparkSession): Unit =
        graft.sim.Similarity.s2AnnLsh(sess, d)
          .write.format("noop").mode("overwrite").save()
      val coldNoTable = time(s2In(spark.newSession()))
      val tableWrite = time(graft.sim.Similarity.persistAnnIndex(spark, d))
      val fresh = spark.newSession()
      val coldTable = time(s2In(fresh))
      // warm probe in the SAME table-served session: the served scan
      // goes through the session cache (r10 wrapping fix), so repeat
      // probes read memory, not parquet
      val warmTable = time(s2In(fresh))
      graft.lake.IndexTables.drop(spark, "annf", s"$d/embeddings.parquet")
      val restartBreakeven =
        if (coldNoTable > coldTable)
          math.ceil(tableWrite / (coldNoTable - coldTable)).toInt
        else -1

      f""""$d":{"cold_bucket_build":$coldBucket%.3f,"warm_s10":$warmS10%.3f,"brute_s1":$brute%.3f,"breakeven_probes":$breakeven,"cold_d13":$coldD13%.3f,"warm_d13":$warmD13%.3f,"s2_cold_session_no_table":$coldNoTable%.3f,"ann_table_write":$tableWrite%.3f,"s2_cold_session_table":$coldTable%.3f,"s2_warm_session_table":$warmTable%.3f,"breakeven_restarts":$restartBreakeven}"""
    }
    println(rows.mkString("{\"metric\":\"index_lifecycle\",\"tiers\":{", ",", "}}"))
    spark.stop()
  }
}
