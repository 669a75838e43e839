package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** d12 residual adjudication (r9): is the asymmetric-prefix candidate
  * growth OUTPUT-bounded? For each tier, counts distinct sets, prefix
  * candidates (rep grain), and verified rep pairs — if candidates per
  * verified pair stay ~constant across tiers, the bexp 1.29 residual
  * is the answer set's own growth, not filter degradation.
  */
object D12Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = graft.lake.Tables.documents(spark, dir)
      val out = graft.text.SetSimilarity.d12DiagCounts(docs)
      println(s"""{"dir":"$dir",$out}""")
    }
    spark.stop()
  }
}
