package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication tool for f_edit_distance's bench cost: separates the
  * blocked-pair GENERATION cost from the per-pair levenshtein KERNEL
  * cost, and compares the banded (threshold) and common-prefix-stripped
  * forms.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.LevDiag"
  */
object LevDiag {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
    val a = c.select(col("c_custkey").as("a_key"),
      col("c_nationkey").as("nk"), col("c_name").as("a_name"))
    val b = c.select(col("c_custkey").as("b_key"),
      col("c_nationkey").as("nk"), col("c_name").as("b_name"))
    val pairs = a.join(b, Seq("nk")).filter(col("a_key") < col("b_key"))
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[levdiag] $tag pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("pairs-only")(pairs.select(col("a_key"), col("b_key")))
    time("lev-full")(pairs.select(col("a_key"), col("b_key"),
      levenshtein(col("a_name"), col("b_name")).as("dist"))
      .filter(col("dist") <= 2))
    time("lev-banded")(pairs.select(col("a_key"), col("b_key"),
      levenshtein(col("a_name"), col("b_name"), 2).as("dist"))
      .filter(col("dist") >= 0))
    time("lev-banded-suffix")(pairs.select(col("a_key"), col("b_key"),
      levenshtein(substring(col("a_name"), 10, 9),
        substring(col("b_name"), 10, 9), 2).as("dist"))
      .filter(col("dist") >= 0))
    // the shipped kernel: general prefix/suffix strip + band, no
    // data-format assumption (the suffix variant above hardcodes the
    // 'Customer#' width — kept only as the upper-bound comparison)
    graft.functions.BoundedLevenshteinFn.ensureRegistered(spark)
    time("graft-lev")(pairs.select(col("a_key"), col("b_key"),
      expr("graft_lev(a_name, b_name, 2)").as("dist"))
      .filter(col("dist") >= 0))
    spark.stop()
  }
}
