package graft.tools
import org.apache.spark.sql.SparkSession
object CandCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { d =>
      graft.functions.VectorExpressions.ensureRegistered(spark)
      val bt = graft.sim.Similarity.labeledBucketTable(spark, d)
      import org.apache.spark.sql.functions._
      val cand = bt.as("c").join(
          broadcast(bt.filter(col("vec_id") < 10)).as("q"),
          col("q.tbl") === col("c.tbl") && col("q.bk") === col("c.bk") &&
            col("q.label") === col("c.label") &&
            col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"))
        .dropDuplicates("q_id", "n_id")
      println(s"$d: candidates = ${cand.count()}")
    }
    spark.stop()
  }
}
