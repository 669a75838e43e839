package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ONE clean warm-LPA law (r14 verdict #5): INDEX_INCREMENT_R14 and
  * R14B disagreed at the big tiers (warm 8.3 vs 7.3 s, build 46 vs
  * 124 s) because each record held a single co-tenant-exposed sample
  * and neither recorded the frontier-ball size that governs the warm
  * pass's cost. This tool fixes both:
  *
  *   - per tier, `trials` INDEPENDENT setups (fresh temp tier, fresh
  *     memo — the warm pass mutates its memo, so repetition demands
  *     re-setup), each timing memo build, warm re-propagation after
  *     the ~1%-orders delta, and the plain from-scratch propagation
  *     on the grown graph; ALL samples reported, min is the law;
  *   - the ball trajectory (|A_i| per round vs |nodes|, plus
  *     ball-incident edges at the final round vs |edges|) measured
  *     once per tier — the locality variable the warm/full ratio is
  *     a function of.
  *
  *   sbt "runMain graft.tools.WarmLpaBench /root/testdata/sf0.1 /tmp/graft_sf1"
  *
  * Output: one JSON line (commit as WARM_LPA_R*.json).
  */
object WarmLpaBench {
  def main(args: Array[String]): Unit = {
    val (dirs, trials) = {
      val (ds, opts) = args.partition(a => !a.startsWith("--"))
      val t = opts.collectFirst {
        case o if o.startsWith("--trials=") => o.stripPrefix("--trials=").toInt
      }.getOrElse(3)
      (if (ds.nonEmpty) ds.toSeq
       else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1"), t)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warmlpa_wh")
      .config("javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName=/tmp/graft_warmlpa_db;create=true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Graph

    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val rows = dirs.filter(d =>
        new java.io.File(s"$d/lineitem.parquet").exists()).map { d =>
      val li = spark.read.parquet(s"$d/lineitem.parquet")

      def setup(): (String, org.apache.spark.sql.DataFrame) = {
        val td = java.nio.file.Files.createTempDirectory("warmlpa").toString
        li.filter(pmod(col("l_orderkey"), lit(100)) =!= 0)
          .write.parquet(s"$td/lineitem.parquet")
        (td, li.filter(pmod(col("l_orderkey"), lit(100)) === 0)
          .localCheckpoint())
      }

      // ---- ball trajectory, measured once (plan cost, not a race) ---
      val (td0, delta0) = setup()
      val preAdj = Graph.coOrderWeightedFrom(
          spark.read.parquet(s"$td0/lineitem.parquet"))
        .filter(col("w") >= Graph.MinCoOrders)
      delta0.write.mode("append").parquet(s"$td0/lineitem.parquet")
      val adj = Graph.coOrderWeightedFrom(
          spark.read.parquet(s"$td0/lineitem.parquet"))
        .filter(col("w") >= Graph.MinCoOrders).localCheckpoint()
      val nodes = adj.select(col("u").as("node")).distinct().localCheckpoint()
      val nNodes = nodes.count()
      val nEdges = adj.count()
      val deltaPairs = Graph.coOrderWeightedFrom(delta0).localCheckpoint()
      val touchedAll = deltaPairs.select(col("u").as("node")).distinct()
        .localCheckpoint()
      val nTouched = touchedAll.count()
      val nDeltaPairs = deltaPairs.filter(col("u") < col("v")).count()
      var affected = touchedAll
        .join(nodes, Seq("node"), "left_semi").localCheckpoint()
      val ballSizes = Seq.newBuilder[Long]
      ballSizes += affected.count()
      // lpaLabels memoizes 5 rounds (prior.size = 6 states); the warm
      // pass expands the ball once per round 1..5
      (1 to 5).foreach { _ =>
        affected = affected.unionByName(
            adj.join(affected.withColumnRenamed("node", "u"), "u")
              .select(col("v").as("node")))
          .distinct().localCheckpoint()
        ballSizes += affected.count()
      }
      val ballEdges = adj
        .join(affected.select(col("node").as("v")), Seq("v"), "left_semi")
        .count()
      val balls = ballSizes.result()
      val preNodes = preAdj.select("u").distinct().count()

      // ---- timed trials: fresh setup each (the memo mutates) --------
      // nightly conditions: the adjacency is SERVED (persisted, delta
      // appended before the warm pass), so warm and full both read the
      // same bucketed table and the timings isolate PROPAGATION — the
      // R14/R14B records mixed in cold adjacency rebuilds, which is
      // where their disagreement lived
      val samples = (1 to trials).map { _ =>
        val (td, delta) = setup()
        graft.lake.IndexTables.persist(spark,
          Graph.coOrderWeightedFrom(
            spark.read.parquet(s"$td/lineitem.parquet")),
          Graph.CoAdjPrefix, td, Seq("u"))
        val buildSec = time(Graph.lpaLabels(spark, td))
        val sigAdj = Graph.adjacencyStamp(spark, td).get
        val sigLpa = Graph.lpaStamp(spark, td).get
        delta.write.mode("append").parquet(s"$td/lineitem.parquet")
        Graph.appendAdjacencyIncrement(spark, td, delta, sigAdj)
        val warmSec = time(
          Graph.warmLpaAfterAppend(spark, td, delta, sigLpa))
        val fullSec = time(Graph.labelPropagation(
          Graph.coAdj(spark, td)
            .filter(col("w") >= Graph.MinCoOrders), 5).count())
        Graph.dropAdjacency(spark, td)
        (buildSec, warmSec, fullSec)
      }
      def arr(f: ((Double, Double, Double)) => Double): String =
        samples.map(s => f"${f(s)}%.2f").mkString("[", ",", "]")
      val warmMin = samples.map(_._2).min
      val fullMin = samples.map(_._3).min
      f""""$d":{"nodes":$nNodes,"edges":$nEdges,"pre_nodes":$preNodes,"delta_pairs":$nDeltaPairs,"delta_touched_parts":$nTouched,"ball_per_round":${balls.mkString("[", ",", "]")},"ball_final_frac":${balls.last.toDouble / nNodes}%.3f,"ball_edges":$ballEdges,"ball_edge_frac":${ballEdges.toDouble / nEdges}%.3f,"build_samples":${arr(_._1)},"warm_samples":${arr(_._2)},"full_samples":${arr(_._3)},"warm_min_sec":$warmMin%.2f,"full_min_sec":$fullMin%.2f,"warm_over_full":${warmMin / fullMin}%.3f}"""
    }
    println(rows.mkString(
      "{\"metric\":\"warm_lpa\",\"trials\":" + trials + ",\"tiers\":{",
      ",", "}}"))
    spark.stop()
  }
}
