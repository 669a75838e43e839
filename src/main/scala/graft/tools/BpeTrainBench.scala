package graft.tools

import org.apache.spark.sql.SparkSession

/** The BPE merge-loop scale ceiling, measured (r14 verdict #4): the
  * old per-merge distributed loop paid one full Spark job (explode +
  * argmax collect + replace + checkpoint over the word contraction)
  * PER MERGE — a production vocab (~30 k merges) meant ~30 k
  * sequential jobs. The in-memory trainer pays the distributed
  * contraction scan ONCE and runs the merge loop on the driver.
  *
  * This tool times both: the in-memory trainer at a production-shaped
  * merge count, and the distributed loop at a small count (its
  * per-merge cost is flat — each round is the same explode over the
  * contraction — so total extrapolates linearly).
  *
  *   sbt "runMain graft.tools.BpeTrainBench /root/testdata/sf0.1 1000"
  *
  * Output: one JSON line (commit as BPE_TRAIN_R*.json).
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nMerges = if (args.length > 1) args(1).toInt else 1000
    val distMerges = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // in-memory: one contraction scan + driver loop at nMerges
    val ((_, memMerges), memSec) =
      time(graft.text.TextAnalysis.trainBpe(spark, d, nMerges))
    // distributed reference at distMerges (one Spark job per merge)
    val ((_, distList), distSec) =
      time(graft.text.TextAnalysis.trainBpeDistributed(spark, d, distMerges))
    val perMerge = distSec / distMerges
    val extrapolated = perMerge * nMerges
    // sanity: the two agree on the prefix they share
    val prefixEqual =
      memMerges.take(distMerges) == distList.take(distMerges)

    println(f"""{"metric":"bpe_train","tier":"$d","merges":$nMerges,"mem_sec":$memSec%.3f,"learned_merges":${memMerges.size},"dist_merges":$distMerges,"dist_sec":$distSec%.3f,"dist_sec_per_merge":$perMerge%.3f,"dist_extrapolated_sec":$extrapolated%.1f,"prefix_equal":$prefixEqual}""")
    spark.stop()
  }
}
