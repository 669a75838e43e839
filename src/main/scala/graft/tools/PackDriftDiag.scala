package graft.tools

import org.apache.spark.sql.SparkSession

/** Adjudicates the r14 driver flag on `t10_pack_docs` (2.37× vs r13;
  * r14 verdict "What's wrong #1"): the r13-mandated prefix-sum rewrite
  * replaced ONE window with five plan stages (bucket, subtotal agg,
  * offset window, broadcast join, in-bucket window), a CONSTANT cost
  * that dominates at toy scale and vanishes at the 100× tier (bexp
  * 0.996). This tool measures exactly that trade: the production
  * prefix-sum t10 vs the retained single-window form, same output
  * (asserted), at each tier — separating "the rewrite's constant" from
  * "a machine wave".
  *
  *   sbt "runMain graft.tools.PackDriftDiag /root/testdata/sf0.1 /tmp/graft_sf1"
  *
  * Output: one JSON line (commit as PACK_DRIFT_R*.json).
  */
object PackDriftDiag {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def minTime(f: => Any, n: Int = 3): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    val rows = dirs.filter(d => new java.io.File(d).exists()).map { d =>
      val prefixSec = minTime(
        graft.text.TextAnalysis.queries("t10_pack_docs")(spark, d)
          .write.format("noop").mode("overwrite").save())
      val windowSec = minTime(
        graft.text.TextAnalysis.t10PackDocsWindowForm(spark, d)
          .write.format("noop").mode("overwrite").save())
      val equal = graft.text.TextAnalysis
        .queries("t10_pack_docs")(spark, d).collect().map(_.toString)
        .sameElements(graft.text.TextAnalysis
          .t10PackDocsWindowForm(spark, d).collect().map(_.toString))
      f""""$d":{"prefix_sum_sec":$prefixSec%.3f,"window_form_sec":$windowSec%.3f,"constant_sec":${prefixSec - windowSec}%.3f,"outputs_equal":$equal}"""
    }
    println(rows.mkString(
      "{\"metric\":\"pack_drift\",\"tiers\":{", ",", "}}"))
    spark.stop()
  }
}
