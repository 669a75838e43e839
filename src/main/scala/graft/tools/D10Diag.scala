package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profile of d10_allpairs_jaccard. */
object D10Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.lake.Tables.documents(spark, sfDir)
    // warmup
    graft.text.SetSimilarity.hashedSets(docs)
      .write.format("noop").mode("overwrite").save()

    time("hashedSets (noop)") {
      graft.text.SetSimilarity.hashedSets(docs)
        .write.format("noop").mode("overwrite").save()
    }
    val hs = graft.text.SetSimilarity.hashedSets(docs).localCheckpoint()
    val pref = graft.text.SetSimilarity.prefixes(hs)
    time("prefixes count (checkpointed base)") {
      println("  prefix rows = " + pref.count())
    }
    time("full d10 (noop)") {
      graft.text.SetSimilarity.d10AllPairsJaccard(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full d10 again") {
      graft.text.SetSimilarity.d10AllPairsJaccard(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
