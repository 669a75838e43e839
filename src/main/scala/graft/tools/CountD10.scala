package graft.tools
import org.apache.spark.sql.SparkSession
object CountD10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.1", "/tmp/graft_sf1", "/tmp/graft_sf10").foreach { d =>
      val n10 = graft.text.SetSimilarity.d10AllPairsJaccard(spark, d).count()
      val n12 = graft.text.SetSimilarity.d12Containment(spark, d).count()
      println(s"TIER $d d10=$n10 d12=$n12")
    }
    spark.stop()
  }
}
