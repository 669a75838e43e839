package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** mm5 scale diagnosis (r12): where does the banded-pair volume law
  * come from? Per tier: corpus size, distinct dHash count, the top
  * band-bucket occupancies, and the candidate pair count — pairs are
  * Σ choose(bucket,2), so a bucket whose occupancy grows LINEARLY with
  * the corpus is a quadratic pair law regardless of how sparse the
  * rest of the table is.
  *
  *   sbt "runMain graft.tools.Mm5Diag /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object Mm5Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.mm.Multimodal
    args.foreach { d =>
      import spark.implicits._
      val media = Multimodal.mediaTable(spark, d)
        .select(col("media_id"), col("payload")).as[Multimodal.Media]
      val hashes = Multimodal.perceptualHashes(media).cache()
      val n = hashes.count()
      val distinct = hashes.select("phash").distinct().count()
      val bands = hashes.select(col("media_id"), col("phash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .select(col("band"),
          expr("(phash >> (band * 16)) & 65535").as("bits"))
      val occ = bands.groupBy("band", "bits").agg(count(lit(1)).as("c"))
        .orderBy(desc("c")).limit(8).collect()
        .map(r => s"(b${r.getInt(0)},${r.getLong(1)})=${r.getLong(2)}")
        .mkString(" ")
      val byBucket = bands.groupBy("band", "bits").agg(count(lit(1)).as("c"))
      val pairs = byBucket
        .agg(sum(expr("c * (c - 1) div 2")).as("p")).head().getLong(0)
      val capped = byBucket.filter(col("c") <= Multimodal.MaxBandOccupancy)
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("p"))
        .head().getLong(0)
      println(s"$d: n=$n distinct_phash=$distinct uncapped_pairs=$pairs capped_pairs=$capped top_buckets: $occ")
      hashes.unpersist()
    }
    spark.stop()
  }
}
