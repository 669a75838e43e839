package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** G56Table's twin for the r11/r12 family members: g7 (link
  * prediction) and g8 (label-propagation communities), plain
  * (checkpointed adjacency) vs served from
  * [[graft.queries.Graph.persistAdjacency]]'s u-bucketed table. Both
  * consume [[graft.queries.Graph.coAdj]]; g7 additionally tests the
  * r12 ADVICE fix (no re-checkpoint on top of the served scan, so the
  * wedge self-join consumes the bucket layout), and g8's per-round
  * edge⋈label join is g1's iteration shape. Same methodology as
  * GraphTable (broadcast disabled, min-of-3 after warmup,
  * stage-metrics shuffle tally).
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.G78Table /tmp/graft_sf1 /tmp/graft_sf10"
  *
  * Heap note: the sf10 tier's PLAIN g7 pass (broadcast disabled,
  * wedge stream + checkpointed adjacency resident) OOMs the 16 g
  * default — run with SPARK_DRIVER_MEM=48g (the GraphTable
  * precedent).
  */
object G78Table {
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
      f
      val ms = Seq(measure(f), measure(f), measure(f))
      (ms.map(_._1).min, ms.map(_._2).min)
    }
    import graft.queries.Graph
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "/root/repo/SCALE_G78TABLE.json")
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = {
      val line =
        s"""{"metric":"graph_table_serving_g7_g8","broadcast":"disabled","passes":3,"tiers":{${done.mkString(",\n")}}}"""
      println(line)
      try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    dirs.foreach { d =>
      Graph.dropAdjacency(spark, d)
      val (g7Plain, g7PlainB) = min3(noop(Graph.g7LinkPredict(spark, d)))
      val (g8Plain, g8PlainB) = min3(noop(Graph.g8Communities(spark, d)))
      val (persistSec, _) = measure { Graph.persistAdjacency(spark, d) }
      val (g7Tab, g7TabB) = min3(noop(Graph.g7LinkPredict(spark, d)))
      val (g8Tab, g8TabB) = min3(noop(Graph.g8Communities(spark, d)))
      Graph.dropAdjacency(spark, d)
      def row(p: (Double, Long), t: (Double, Long)) =
        f""""plain_sec":${p._1}%.3f,"plain_shuffle_mb":${p._2 / 1e6}%.1f,"table_sec":${t._1}%.3f,"table_shuffle_mb":${t._2 / 1e6}%.1f,"byte_drop":${1.0 - t._2.toDouble / math.max(1L, p._2)}%.3f"""
      done += s""""$d":{"persist_sec":${f"$persistSec%.1f"},
         |  "g7_full":{${row((g7Plain, g7PlainB), (g7Tab, g7TabB))}},
         |  "g8_full":{${row((g8Plain, g8PlainB), (g8Tab, g8TabB))}}}""".stripMargin
      flush()
    }
    spark.stop()
  }
}
