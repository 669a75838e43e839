package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the per-iteration shuffle-byte drop of g1's bucketed-edges
  * form (r8 verdict #6) at sf0.1: one PageRank round over (a) the
  * shipped localCheckpoint'd edge relation and (b) the same relation
  * persisted bucketed on src — bytes via the stage-metrics listener
  * (plan-deterministic, co-tenant-immune, same rationale as
  * ScaleBench's bexp).
  *
  *   sbt "runMain graft.tools.G1Bucketed /root/testdata/sf0.1"
  */
object G1Bucketed {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val warehouse =
      java.nio.file.Files.createTempDirectory("graft_g1b").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
        }
      })
    def quiesce(): Unit = {
      while (spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty)
        Thread.sleep(20)
      Thread.sleep(150)
    }
    def measure(f: => Unit): (Double, Long) = {
      quiesce()
      val b0 = read.get() + write.get()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      quiesce()
      (sec, read.get() + write.get() - b0)
    }

    import graft.queries.Graph
    val plainEw = Graph.edgesWithOut(spark, d).localCheckpoint()
    Graph.edgesWithOut(spark, d) // JIT/codegen warm of the build path
    graft.lake.Bucketing.writeBucketed(
      Graph.edgesWithOut(spark, d), "g1_edges_bkt_tool", "src")
    val bktEw = spark.table("g1_edges_bkt_tool")

    val rank0 = plainEw.select("src").distinct()
      .select(col("src").as("node"), lit(1000000L).as("rank"))
      .localCheckpoint()

    def round(ew: org.apache.spark.sql.DataFrame): Unit =
      Graph.iterationStep(ew, rank0)
        .write.format("noop").mode("overwrite").save()

    round(plainEw); round(bktEw) // warmup both shapes
    val (tp, bp) = measure { round(plainEw) }
    val (tb, bb) = measure { round(bktEw) }
    println(f"""{"metric":"g1_bucketed_iteration","dir":"$d","plain_sec":$tp%.3f,"plain_shuffle_mb":${bp / 1e6}%.1f,"bucketed_sec":$tb%.3f,"bucketed_shuffle_mb":${bb / 1e6}%.1f,"byte_drop":${1.0 - bb.toDouble / math.max(1L, bp)}%.3f}""")
    spark.stop()
  }
}
