package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Bucketing
import graft.queries.Graph

/** The g3/g4 scaladocs' named 100 TB shape, demonstrated (the
  * BucketedG1Spec pattern): with the undirected adjacency persisted
  * BUCKETED on `u`, each BFS/relaxation round's expansion join consumes
  * the bucket layout with no Exchange on the (edge-sized) adjacency
  * side — only the node-sized frontier/delta aligns. This is the byte
  * lever SCALE_G_R10.json records as dominating both operators' shuffle
  * volume (the delta form cut g4's wall 102→70 s but not its bytes;
  * this cuts the bytes).
  */
class BucketedGraphSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed adjacency: expansion join has no Exchange on the edge side; BFS and relaxation results identical") {
    val prevT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = Graph.coOrderEdges(spark, sf)
      val adj = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      Bucketing.writeBucketed(adj, "g3_adj_bkt", "u", buckets = 8)
      val badj = spark.table("g3_adj_bkt")
      val plainAdj = adj.localCheckpoint()
      val seeds = badj.select(col("u").as("part")).distinct()
        .orderBy("part").limit(5).localCheckpoint()

      // one round's expansion join, the relation every g3 hop and g4
      // relaxation runs: bucketed scan feeds the join directly — only
      // the frontier side exchanges
      val frontier = seeds.select(col("part").as("u"))
      val bucketedShuffles = countShuffles(badj.join(frontier, "u"))
      val plan = badj.join(frontier, "u")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"adjacency scan did not use the bucket layout:\n$plan")
      val plainShuffles = countShuffles(plainAdj.join(frontier, "u"))
      assert(bucketedShuffles == 1 && plainShuffles == 2,
        s"expansion exchanges: bucketed=$bucketedShuffles (want 1: " +
          s"frontier align), plain=$plainShuffles (want 2)")

      // the composite fixed points are identical off either layout
      def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.toString).toSet
      assert(rows(Graph.bfsDistances(badj, seeds, 3)) ==
        rows(Graph.bfsDistances(plainAdj, seeds, 3)),
        "bucketed BFS diverged")
      val wadj = plainAdj.withColumn("cost", lit(7L))
      Bucketing.writeBucketed(wadj, "g4_adj_bkt", "u", buckets = 8)
      val nseeds = seeds.select(col("part").as("node"))
      assert(rows(Graph.cheapestPaths(spark.table("g4_adj_bkt"), nseeds, 3)) ==
        rows(Graph.cheapestPaths(wadj.localCheckpoint(), nseeds, 3)),
        "bucketed relaxation diverged")
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k)
      }
      restore("spark.sql.autoBroadcastJoinThreshold", prevT)
      restore("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
      spark.sql("DROP TABLE IF EXISTS g3_adj_bkt")
      spark.sql("DROP TABLE IF EXISTS g4_adj_bkt")
    }
  }
}
