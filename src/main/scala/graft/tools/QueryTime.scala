package graft.tools

import org.apache.spark.sql.SparkSession

/** Adjudication tool: time named SparkEntry queries N times back to back
  * on one SF dir, printing every sample (not just the min) so cross-round
  * drift flagged by Bench's `regressions` field gets a named cause —
  * either "reproduces every run" (plan problem) or "one-off stall"
  * (environment).
  *
  *   sbt "runMain graft.tools.QueryTime w3_lag_lead w2_running_sum"
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 (default)
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SAMPLES", "4").toInt
    // same CPU knob as Bench — this tool adjudicates Bench numbers, so
    // it must measure under the same parallelism/partitioning config
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("a1_groupby_sum_top5")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // one warmup on the small tier for codegen/JIT, same as Bench
      try fn(spark, "/root/testdata/sf0.01")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")} (min ${times.min}%.2f s)")
    }
    spark.stop()
  }
}
