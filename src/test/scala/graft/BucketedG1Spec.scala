package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Bucketing
import graft.queries.Graph

/** g1's named 100 TB shape, demonstrated (r8 verdict #6): with the edge
  * relation persisted BUCKETED on src, the per-iteration edge⋈rank join
  * must consume the bucket layout with no Exchange on the edge side —
  * the fact-sized relation is never reshuffled, only the node-sized
  * rank vector moves (plus the inherent dst re-key aggregation).
  */
class BucketedG1Spec extends AnyFunSuite {
  import TestSpark._

  test("bucketed edges iterate with 2 exchanges (rank align + dst agg) vs 3 plain; bit-identical result") {
    // disable both broadcast paths: at sf0.001 AQE would broadcast the
    // rank side and hide the partitioning property under test (at
    // 100 TB the rank vector of a trillion-edge graph is not
    // broadcastable either)
    val prevT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Graph.edgesWithOut(spark, sf),
        "g1_edges_bkt", "src", buckets = 8)
      val ew = spark.table("g1_edges_bkt")
      val rank0 = ew.select("src").distinct()
        .select(col("src").as("node"), lit(1000000L).as("rank"))
        .localCheckpoint()

      val bucketedStep = Graph.iterationStep(ew, rank0)
      val bucketedShuffles = countShuffles(bucketedStep)
      val plan = bucketedStep.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"edge scan did not use the bucket layout:\n$plan")
      assert(bucketedShuffles == 2,
        s"bucketed iteration planned $bucketedShuffles exchanges " +
          s"(want 2: rank align + dst agg):\n$plan")

      val plainEw = Graph.edgesWithOut(spark, sf).localCheckpoint()
      val plainShuffles = countShuffles(Graph.iterationStep(plainEw, rank0))
      assert(plainShuffles == 3,
        s"plain iteration planned $plainShuffles exchanges (want 3)")

      // the bucketed composite is the SAME fixed point, bit for bit
      val a = Graph.g1PagerankBucketed(spark, sf, "g1_edges_bkt2", 8)
        .collect().map(_.toString).toSeq
      val b = Graph.g1Pagerank(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, "bucketed form diverged from the shipped form")
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
      restore("spark.sql.autoBroadcastJoinThreshold", prevT)
      restore("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
      spark.sql("DROP TABLE IF EXISTS g1_edges_bkt")
      spark.sql("DROP TABLE IF EXISTS g1_edges_bkt2")
    }
  }
}
