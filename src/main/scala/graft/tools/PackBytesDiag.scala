package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudicate t17/t36's 100×-step shuffle-byte exponent (~1.19,
  * SCALE_NEW_R14_10to100): decompose the query into (a) the slim
  * prefix-sum assignment, (b) the text join alone, and (c) the full
  * payload agg, and read each leg's bytes at two tiers — the leg whose
  * exponent exceeds 1 owns the law.
  *
  *   sbt "runMain graft.tools.PackBytesDiag /tmp/graft_sf1 /tmp/graft_sf10"
  */
object PackBytesDiag {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new ScaleBench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    def bytesOf(df: DataFrame): Double = {
      ScaleBench.quiesce(spark)
      val b0 = tally.snapshot
      df.write.format("noop").mode("overwrite").save()
      ScaleBench.quiesce(spark)
      (tally.snapshot - b0) / 1e6
    }

    val legs = dirs.map { d =>
      val docs = graft.lake.Tables.documents(spark, d)
      val slim = docs
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
      val assigned = graft.ops.PrefixSum.runningBefore(
          slim.localCheckpoint(), "lang", "doc_id", "n_tokens", "tok_before")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr("tok_before div 2048L").as("pack_id"))
      val aBytes = bytesOf(assigned)
      val joined = assigned.join(docs.select("doc_id", "text"), "doc_id")
      val jBytes = bytesOf(joined)
      val counts = joined.groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
      val cBytes = bytesOf(counts)
      val payload = joined.groupBy("lang", "pack_id")
        .agg(expr("""array_join(transform(
            array_sort(collect_list(struct(doc_id, text))), x -> x.text),
            ' <eos> ')""").as("payload"))
      val pBytes = bytesOf(payload)
      f""""$d":{"assign_mb":$aBytes%.1f,"join_mb":$jBytes%.1f,"count_agg_mb":$cBytes%.1f,"payload_agg_mb":$pBytes%.1f}"""
    }
    println(legs.mkString("{\"metric\":\"pack_bytes_diag\",\"tiers\":{", ",", "}}"))
    spark.stop()
  }
}
