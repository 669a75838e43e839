package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnoses the ANN bucket-occupancy skew recorded in round 9
  * (SCALE10TO100_ANN.json: sf1→sf10 candidate bytes grew ×47 where the
  * uniform-occupancy model predicts ×15). Per tier and hash table:
  * occupancy moments (max, Σc², candidate pairs Σc(c−1)/2 vs the uniform
  * model n²/2^bits/2), the top occupancies, and — for the single most
  * crowded bucket — how much of its mass is exact-clone vectors vs
  * genuinely co-bucketed distinct vectors. The answer decides the fix:
  * clone mass contracts (the d10 pattern), geometric crowding splits
  * (recursive refinement).
  *
  *   sbt "runMain graft.tools.AnnSkewDiag /tmp/graft_sf1 /tmp/graft_sf10"
  */
object AnnSkewDiag {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.ensureRegistered(spark)

    dirs.foreach { d =>
      val bt = graft.sim.Similarity.bucketTable(spark, d)
      val occ = bt.groupBy("tbl", "bk").agg(count(lit(1)).as("c"))
        .persist()
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      println(s"=== $d  n=$n ===")
      occ.groupBy("tbl").agg(
          count(lit(1)).as("buckets"),
          max("c").as("maxocc"),
          sum(col("c") * col("c")).as("sumc2"),
          sum(col("c") * (col("c") - 1) / 2).as("pairs"))
        .orderBy("tbl")
        .collect()
        .foreach { r =>
          println(f"tbl=${r.getInt(0)}%d buckets=${r.getLong(1)}%6d " +
            f"maxocc=${r.getLong(2)}%7d sumc2=${r.getLong(3)}%12d " +
            f"pairs=${r.getAs[java.math.BigDecimal](4)}%s")
        }
      val top = occ.orderBy(desc("c")).limit(8).collect()
      println("top buckets: " + top.map(r =>
        s"(tbl=${r.getInt(0)},bk=${r.get(1)},c=${r.getLong(2)})").mkString(" "))
      // clone composition of the most crowded bucket
      val t0 = top.head
      val members = bt
        .filter(col("tbl") === t0.getInt(0) && col("bk") === t0.get(1))
        .select("vec_id")
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val distinctVecs = members.join(emb, "vec_id")
        .select(md5(to_json(struct(col("embedding")))).as("sig"))
        .distinct().count()
      println(s"most crowded bucket: ${t0.getLong(2)} rows, " +
        s"$distinctVecs distinct vectors")
      occ.unpersist()
    }
    spark.stop()
  }
}
