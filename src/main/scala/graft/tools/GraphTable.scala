package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what serving the graph family's adjacency from
  * [[graft.queries.Graph.persistAdjacency]]'s bucketed tables buys
  * (r10 verdict #1 "done" criteria): per-round shuffle bytes and wall
  * for ONE g1 iteration / g3 expansion / g4 relaxation, plain
  * (checkpointed relation) vs table-served, plus full-query walls both
  * ways and the one-time persist cost that amortizes over them.
  *
  * Methodology: G1Bucketed's (stage-metrics shuffle tally, broadcast
  * disabled so the node-sized side cannot hide the edge exchange under
  * test — at 100 TB the rank/frontier of a trillion-edge graph is not
  * broadcastable either), min-of-3 after a warmup pass per ScaleBench.
  *
  *   sbt "runMain graft.tools.GraphTable /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object GraphTable {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_gtable_wh")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tally = new ScaleBench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def measure(f: => Unit): (Double, Long) = {
      ScaleBench.quiesce(spark)
      val b0 = tally.snapshot
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      ScaleBench.quiesce(spark)
      (sec, tally.snapshot - b0)
    }
    def min3(f: => Unit): (Double, Long) = {
      f // warmup (JIT + codegen; bytes are plan-deterministic anyway)
      val ms = Seq(measure(f), measure(f), measure(f))
      (ms.map(_._1).min, ms.map(_._2).min)
    }

    import graft.queries.Graph
    import org.apache.spark.storage.StorageLevel
    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/root/repo/SCALE_GTABLE.json")
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = {
      val line =
        s"""{"metric":"graph_table_serving","broadcast":"disabled","passes":3,"tiers":{${done.mkString(",\n")}}}"""
      println(line)
      // written after EVERY tier: a late-tier crash keeps earlier rows
      try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    dirs.foreach { d =>
      Graph.dropAdjacency(spark, d)
      // ---- plain (no table): full queries + one round each ----
      val (g1Plain, g1PlainB) = min3(noop(Graph.g1Pagerank(spark, d)))
      val (g3Plain, g3PlainB) = min3(noop(Graph.g3BfsDistance(spark, d)))
      val (g4Plain, g4PlainB) = min3(noop(Graph.g4CheapestPath(spark, d)))

      // explicit spill-safe persists with owned unpersists: at the sf10
      // tier the edge relations are hundreds of millions of rows, and
      // holding two of them checkpointed across the persist phase
      // OOM-killed the first run of this tool even at 48 g
      def rank0(ew: DataFrame) = ew.select("src").distinct()
        .select(col("src").as("node"), lit(1000000L).as("rank"))
        .localCheckpoint()
      def frontier(adj: DataFrame) = adj.select(col("u").as("part"))
        .distinct().orderBy("part").limit(5).localCheckpoint()
      def g1Round(ew: DataFrame, pr0: DataFrame): Unit =
        noop(Graph.iterationStep(ew, pr0))
      def g3Round(adj: DataFrame, pf0: DataFrame): Unit =
        noop(adj.select("u", "v")
          .join(pf0.select(col("part").as("u")), "u")
          .select(col("v").as("part")).distinct())
      def g4Round(adj: DataFrame, pf0: DataFrame): Unit =
        noop(adj.select(col("u"), col("v"), expr("1000000L div w").as("cost"))
          .join(pf0.select(col("part").as("u"), lit(0L).as("c")), "u")
          .select(col("v").as("node"), (col("c") + col("cost")).as("c"))
          .groupBy("node").agg(min("c").as("c")))

      val plainEw = Graph.edgesWithOut(spark, d)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val pr0 = rank0(plainEw)
      val (r1Plain, r1PlainB) = min3(g1Round(plainEw, pr0))
      plainEw.unpersist(blocking = true)
      val plainAdj = Graph.coOrderWeighted(spark, d)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val pf0 = frontier(plainAdj)
      val (r3Plain, r3PlainB) = min3(g3Round(plainAdj, pf0))
      val (r4Plain, r4PlainB) = min3(g4Round(plainAdj, pf0))
      plainAdj.unpersist(blocking = true)

      // ---- persist once, then table-served ----
      val (persistSec, _) = measure { Graph.persistAdjacency(spark, d) }
      val (g1Tab, g1TabB) = min3(noop(Graph.g1Pagerank(spark, d)))
      val (g3Tab, g3TabB) = min3(noop(Graph.g3BfsDistance(spark, d)))
      val (g4Tab, g4TabB) = min3(noop(Graph.g4CheapestPath(spark, d)))
      val tabs = Seq(
        graft.lake.IndexTables.tableName("g1edges", d),
        graft.lake.IndexTables.tableName("coadj", d)).map(spark.table)
      val (r1Tab, r1TabB) = min3(g1Round(tabs.head, pr0))
      val (r3Tab, r3TabB) = min3(g3Round(tabs(1), pf0))
      val (r4Tab, r4TabB) = min3(g4Round(tabs(1), pf0))
      Graph.dropAdjacency(spark, d)

      def row(p: (Double, Long), t: (Double, Long)) =
        f""""plain_sec":${p._1}%.3f,"plain_shuffle_mb":${p._2 / 1e6}%.1f,"table_sec":${t._1}%.3f,"table_shuffle_mb":${t._2 / 1e6}%.1f,"byte_drop":${1.0 - t._2.toDouble / math.max(1L, p._2)}%.3f"""
      done += s""""$d":{"persist_sec":${f"$persistSec%.1f"},
         |  "g1_iteration":{${row((r1Plain, r1PlainB), (r1Tab, r1TabB))}},
         |  "g3_expansion":{${row((r3Plain, r3PlainB), (r3Tab, r3TabB))}},
         |  "g4_relaxation":{${row((r4Plain, r4PlainB), (r4Tab, r4TabB))}},
         |  "g1_full":{${row((g1Plain, g1PlainB), (g1Tab, g1TabB))}},
         |  "g3_full":{${row((g3Plain, g3PlainB), (g3Tab, g3TabB))}},
         |  "g4_full":{${row((g4Plain, g4PlainB), (g4Tab, g4TabB))}}}""".stripMargin
      flush()
    }
    spark.stop()
  }
}
