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

  test("persistAdjacency: g1/g3/g4/g5 serve the bucketed tables bit-identically; iteration runs off the bucketed scan; staleness drops") {
    // private tier copy (lineitem + orders) so the persisted tables
    // can't leak into other suites' plans for the shared testdata path
    val dir = java.nio.file.Files.createTempDirectory("graph_adj_corpus")
    Seq("lineitem.parquet", "orders.parquet").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf, t), dir.resolve(t))
    }
    val d = dir.toString
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    try {
      val names = Seq("g1_pagerank", "g3_bfs_distance",
        "g4_cheapest_path", "g5_components")
      val base = names.map(n => n -> rows(Graph.queries(n)(spark, d))).toMap
      assert(base.values.forall(_.nonEmpty))

      val tables = Graph.persistAdjacency(spark, d, buckets = 4)
      assert(tables.forall(spark.catalog.tableExists),
        s"persistAdjacency tables missing: $tables")

      // a FRESH session serves the tables and lands on the same fixed
      // points, bit for bit (integer arithmetic — plan-independent)
      val fresh = spark.newSession()
      names.foreach { n =>
        assert(rows(Graph.queries(n)(fresh, d)) == base(n),
          s"$n diverged off the served table")
      }

      // one g1 round off the SERVED table: the bucketed scan feeds the
      // join — 2 exchanges (rank align + dst agg), never the edge side
      val prevT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        // the served table stores PLAIN (src, dst, w) since the r14
        // appendable layout — the out-weight is recovered on read by
        // the merge agg + src-keyed normalization join, both of which
        // must ride the bucket layout without adding an exchange
        val t0 = spark.table(tables.head)
        val edges = t0.groupBy("src", "dst").agg(sum("w").as("w"))
        val ew = edges.join(
          edges.groupBy("src").agg(sum("w").as("wout")), "src")
        val rank0 = ew.select("src").distinct()
          .select(col("src").as("node"), lit(1000000L).as("rank"))
          .localCheckpoint()
        val step = Graph.iterationStep(ew, rank0)
        val n = countShuffles(step)
        val plan = step.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"),
          s"served edge scan did not use the bucket layout:\n$plan")
        assert(n == 2,
          s"served iteration with merge-on-read normalization planned " +
            s"$n exchanges (want 2 — rank align + dst agg):\n$plan")
      } finally {
        def restore(k: String, v: Option[String]): Unit = v match {
          case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k)
        }
        restore("spark.sql.autoBroadcastJoinThreshold", prevT)
        restore("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
      }

      // staleness: a corpus rewrite (mtime moves the signature) makes
      // the next query fall back AND drops the garbage tables
      java.nio.file.Files.setLastModifiedTime(
        dir.resolve("lineitem.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 5000))
      assert(rows(Graph.g3BfsDistance(spark, d)) == base("g3_bfs_distance"),
        "post-staleness fallback diverged")
      assert(rows(Graph.g1Pagerank(spark, d)) == base("g1_pagerank"),
        "post-staleness g1 fallback diverged")
      // ...and each serve attempt dropped its garbage table
      assert(!tables.exists(spark.catalog.tableExists),
        "stale adjacency tables left in the catalog")
    } finally Graph.dropAdjacency(spark, d)
  }

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

  test("served adjacency: g2 is bit-identical, its base scan is bucketed, and the oriented relation legitimately re-partitions (r12 verdict #4)") {
    val dir = java.nio.file.Files.createTempDirectory("graph_adj_g2")
    Seq("lineitem.parquet", "orders.parquet").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf, t), dir.resolve(t))
    }
    val d = dir.toString
    try {
      val base = Graph.g2Triangles(spark, d).collect().map(_.toString).toSeq
      assert(base.nonEmpty)
      val tables = Graph.persistAdjacency(spark, d, buckets = 4)

      // served g2 from a FRESH session lands on the same counts, bit
      // for bit (integer arithmetic — plan-independent)
      val fresh = spark.newSession()
      assert(Graph.g2Triangles(fresh, d).collect().map(_.toString).toSeq
        == base, "g2 diverged off the served table")

      // the serving win g2 gets: the u<v base-edge derivation reads the
      // persisted TABLE scan instead of re-aggregating lineitem (the
      // fact-sized shuffle — the 5.41→3.72 s drop BENCH r12 records).
      // Standalone, the planner rightly reads it un-bucketed ("disabled
      // by query planner": no join here consumes the layout — full scan
      // parallelism wins); the layout-consuming members are pinned by
      // the g7/g8 test below.
      val basePlan = Graph.coOrderEdges(spark, d)
        .queryExecution.executedPlan.toString
      assert(basePlan.contains("graft_coadj"),
        s"served g2 base edges do not read the persisted table:\n$basePlan")
      assert(!basePlan.contains("lineitem"),
        s"served g2 base edges still rebuild from the fact table:\n$basePlan")

      // ...and the documented limit: g2's wedge key is the ORIENTED
      // `src`, not the table's bucket key `u` — the orientation flips
      // edges across buckets, so the wedge self-join CANNOT ride the
      // layout the way g7's u-keyed one does (g2Triangles docstring).
      // The full g2 plan therefore still exchanges; this is the
      // checkpoint-vs-serving asymmetry, pinned as intended behavior.
      val g2Plan = Graph.g2Triangles(spark, d)
        .queryExecution.executedPlan.toString
      assert(g2Plan.contains("Exchange"),
        "g2's oriented wedge join unexpectedly became exchange-free — " +
          "revisit the docstring's posture (a src-bucketed table?)")
    } finally Graph.dropAdjacency(spark, d)
  }

  test("served adjacency: g7's wedge self-join is exchange-FREE (both sides bucketed); g8's vote join exchanges only the label side; results bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graph_adj_g78")
    Seq("lineitem.parquet", "orders.parquet").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf, t), dir.resolve(t))
    }
    val d = dir.toString
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    try {
      val base7 = rows(Graph.g7LinkPredict(spark, d))
      val base8 = rows(Graph.g8Communities(spark, d))
      assert(base7.nonEmpty && base8.nonEmpty)
      val tables = Graph.persistAdjacency(spark, d, buckets = 4)

      // bit-identity off the served tables from a FRESH session
      val fresh = spark.newSession()
      assert(rows(Graph.g7LinkPredict(fresh, d)) == base7,
        "g7 diverged off the served table")
      assert(rows(Graph.g8Communities(fresh, d)) == base8,
        "g8 diverged off the served table")

      val prevT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        val coadj = spark.table(tables(1)) // CoAdjPrefix table (u-bucketed)
        // g7's wedge join exactly as the query builds it (filter +
        // project preserve the scan's partitioning — the r12 ADVICE
        // fix removed the localCheckpoint that discarded it)
        val adj7 = coadj.filter(col("w") >= 2).select("u", "v")
        val wedges = adj7.as("e1").hint("shuffle_hash").join(adj7.as("e2"),
          col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
        val n7 = countShuffles(wedges)
        val plan7 = wedges.queryExecution.executedPlan.toString
        assert(plan7.contains("Bucketed: true"),
          s"wedge legs did not use the bucket layout:\n$plan7")
        assert(n7 == 0,
          s"served wedge self-join planned $n7 exchanges (want 0):\n$plan7")

        // one g8 vote join: the edge side rides the bucketed scan, only
        // the node-sized label vector aligns
        val adj8 = coadj.filter(col("w") >= 3)
        val labels0 = adj8.select(col("u").as("node")).distinct()
          .withColumn("label", col("node")).localCheckpoint()
        val vote = adj8.join(labels0.withColumnRenamed("node", "u"), "u")
        val n8 = countShuffles(vote)
        val plan8 = vote.queryExecution.executedPlan.toString
        assert(plan8.contains("Bucketed: true"),
          s"g8 edge scan did not use the bucket layout:\n$plan8")
        assert(n8 == 1,
          s"served vote join planned $n8 exchanges (want 1: label align):\n$plan8")
      } finally {
        def restore(k: String, v: Option[String]): Unit = v match {
          case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k)
        }
        restore("spark.sql.autoBroadcastJoinThreshold", prevT)
        restore("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
      }
    } finally Graph.dropAdjacency(spark, d)
  }
}
