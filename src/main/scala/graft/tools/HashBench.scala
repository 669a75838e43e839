package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Hashing
import graft.lake.Tables
import graft.text.Dedup

/** Dev tool: time the d2 candidate pipeline under the portable md5
  * hash family vs the production xxhash64 family (PROGRESS.md round 3).
  *
  *   sbt "runMain graft.tools.HashBench /root/testdata/sf0.1"
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fam: Hashing.HashFamily): Double = {
      val t0 = System.nanoTime()
      Dedup.candidatePairsFor(Tables.documents(spark, sf), fam)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both, then min-of-2 each (same methodology as Bench)
    run(Hashing.md5Family); run(Hashing.xxFamily)
    val md5 = math.min(run(Hashing.md5Family), run(Hashing.md5Family))
    val xx = math.min(run(Hashing.xxFamily), run(Hashing.xxFamily))
    println(f"md5=$md5%.2fs xx=$xx%.2fs speedup=${md5 / xx}%.2fx")
    spark.stop()
  }
}
