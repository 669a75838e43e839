package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lake.{Tables, ZOrder}

/** Z-order layout: the file/row-group pruning the Morton key buys on a
  * second filter dimension — the property single-column sorting cannot
  * provide. The z1 key itself is DuckDB-oracled; this spec pins the
  * LAYOUT effect.
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  /** Rows the parquet scan emits after row-group/file pruning (the
    * pushed filter skips whole units; the metric counts what survived).
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = {
      val self = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
        case _ => 0L
      }
      self + p.children.map(walk).sum +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ => 0L
        })
    }
    walk(df.queryExecution.executedPlan)
  }

  test("z-order layout prunes a second-dimension filter; a value-sorted layout cannot") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val ev = Tables.events(spark, sf)
      .withColumn("value_c", expr("cast(floor(value * 100) as bigint)"))
      .select("event_id", "user_id", "value_c")
    // layout A: single-column sort by value_c (the "obvious" layout for
    // value-range queries) — user_id is uniform within every file
    ev.repartitionByRange(8, col("value_c")).sortWithinPartitions("value_c")
      .write.parquet(s"$base/linear")
    // layout Z: Morton-clustered on (user_id, value_c)
    ZOrder.cluster(ev, "user_id", "value_c", 8).write.parquet(s"$base/zorder")
    val users = ev.agg(min("user_id"), max("user_id")).collect()(0)
    val (uMin, uMax) = (users.getLong(0), users.getLong(1))
    // a one-eighth user_id slice, the dimension layout A did not sort by
    val hi = uMin + (uMax - uMin) / 8
    def pred(df: DataFrame) =
      df.filter(col("user_id") >= uMin && col("user_id") <= hi)
    val both = Seq("linear", "zorder")
      .map(l => l -> scanRows(pred(spark.read.parquet(s"$base/$l"))))
      .toMap
    val total = ev.count()
    assert(both("linear") == total,
      s"value-sorted layout unexpectedly pruned the user filter: $both")
    assert(both("zorder") * 2 <= total,
      s"z-order layout failed to prune at least half the scan: $both of $total")
    // correctness: both layouts select the same rows
    assert(pred(spark.read.parquet(s"$base/zorder")).count() ==
      pred(spark.read.parquet(s"$base/linear")).count())
  }
}
