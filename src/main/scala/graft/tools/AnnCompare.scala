package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Adjudication tool: times the s2/s3 variant forms back to back on
  * sf0.1 (or a given tier), asserting equal output first — the fused
  * score-in-join forms (shipped, r9), the join-then-rank forms
  * (r8-shipped), and the dual-scored baseline. Evidence lands in
  * PROGRESS.md; `Similarity.s2AnnLsh`/`s3EmbeddingNeardup` ship the
  * winner.
  *
  *   sbt "runMain graft.tools.AnnCompare"
  */
object AnnCompare {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fused = graft.sim.Similarity.s2AnnLsh(spark, d)
    val win = graft.sim.Similarity.s2AnnLshJoined(spark, d)
    val agg = graft.sim.Similarity.s2AnnLshAgg(spark, d)
    val dual = graft.sim.Similarity.rankTop3(
      graft.sim.Similarity.s2ScoredDual(spark, d))
    val nf = fused.collect().toSeq
    val nw = win.collect().toSeq
    val na = agg.collect().toSeq
    val nd = dual.collect().toSeq
    require(nw == nf, s"forms disagree: window ${nw.length} rows, fused ${nf.length}")
    require(nw == na, s"forms disagree: window ${nw.length} rows, agg ${na.length}")
    require(nw == nd, s"forms disagree: sym ${nw.length} rows, dual ${nd.length}")
    val s3f = graft.sim.Similarity.s3EmbeddingNeardup(spark, d).collect().toSeq
    val s3j = graft.sim.Similarity.s3EmbeddingNeardupJoined(spark, d).collect().toSeq
    require(s3f == s3j, s"s3 forms disagree: fused ${s3f.length}, joined ${s3j.length}")
    println(s"outputs identical (s2 ${nw.length} rows, s3 ${s3f.length} rows)")

    def time(label: String, mk: () => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: times=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f s")
    }
    time("s2 shipped (fused score-in-join)", () => graft.sim.Similarity.s2AnnLsh(spark, d))
    time("s2 joined+window", () => graft.sim.Similarity.s2AnnLshJoined(spark, d))
    time("s2 joined+topk-agg", () => graft.sim.Similarity.s2AnnLshAgg(spark, d))
    time("s3 shipped (fused prefilter)", () => graft.sim.Similarity.s3EmbeddingNeardup(spark, d))
    time("s3 joined prefilter", () => graft.sim.Similarity.s3EmbeddingNeardupJoined(spark, d))
    spark.stop()
  }
}
