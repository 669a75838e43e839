package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Adjudication tool: times the window and typed-top-k-aggregator
  * ranking forms of s2_ann_lsh back to back on sf0.1, asserting equal
  * output first. Evidence lands in PROGRESS.md; `Similarity.s2AnnLsh`
  * ships the winner.
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

    val win = graft.sim.Similarity.s2AnnLsh(spark, d)
    val agg = graft.sim.Similarity.s2AnnLshAgg(spark, d)
    val dual = graft.sim.Similarity.rankTop3(
      graft.sim.Similarity.s2ScoredDual(spark, d))
    val nw = win.collect().toSeq
    val na = agg.collect().toSeq
    val nd = dual.collect().toSeq
    require(nw == na, s"forms disagree: window ${nw.length} rows, agg ${na.length}")
    require(nw == nd, s"forms disagree: sym ${nw.length} rows, dual ${nd.length}")
    println(s"outputs identical (${nw.length} rows)")

    def time(label: String, mk: () => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: times=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f s")
    }
    time("shipped (sym+window)", () => graft.sim.Similarity.s2AnnLsh(spark, d))
    time("topk-agg", () => graft.sim.Similarity.s2AnnLshAgg(spark, d))
    spark.stop()
  }
}
