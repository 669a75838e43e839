package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Banded range join (the §2.4 extension behind j6_range_join). */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("band membership is exact at the boundaries (inclusive both ends)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "c1")).toDF("k", "lts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00")), // exactly -before -> in
      (1L, ts("2024-01-01 08:59:59")), // 1 s earlier     -> out
      (1L, ts("2024-01-01 10:00:00")), // equal           -> in
      (1L, ts("2024-01-01 10:00:01")), // later, after=0  -> out
      (2L, ts("2024-01-01 09:30:00"))  // other key       -> out
    ).toDF("k", "rts")
    val out = RangeJoin.banded(left, right, "k", "lts", "rts",
      beforeSec = 3600, afterSec = 0)
    assert(out.select("rts").as[java.sql.Timestamp].collect().toSet ==
      Set(ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")))
  }

  test("matches the naive inequality join on real data, without its plan") {
    val ev = graft.lake.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val banded = RangeJoin.banded(clicks, views, "user_id", "ts", "vts",
      beforeSec = 3600)
    val naive = clicks.join(views,
      clicks("user_id") === views("user_id") &&
        views("vts") >= clicks("ts") - expr("INTERVAL 1 HOUR") &&
        views("vts") <= clicks("ts"))
      .select(clicks("event_id"), views("vts"))
    val fast = banded.select("event_id", "vts")
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "banded result differs from the inequality-join reference")
    // the point of the operator: an EQUI join plan, no nested loop
    banded.write.format("noop").mode("overwrite").save()
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"banded join fell back to a non-equi plan:\n$plan")
    // and the join key includes the time bucket, so a hot key's pairs
    // split across buckets instead of going quadratic in one hash cell
    // (the keyed naive join's residual-condition shape — see next test)
    assert(plan.contains("__b"), s"bucket not part of the join key:\n$plan")
  }

  test("the shapes Spark gives WITHOUT banding (documenting both traps)") {
    val ev = graft.lake.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("vts"))
    // pure time band, no equi conjunct -> nested loop, O(L x R)
    val pure = clicks.join(views,
      views("vts") >= clicks("ts") - expr("INTERVAL 1 HOUR") &&
        views("vts") <= clicks("ts"))
    val purePlan = pure.queryExecution.executedPlan.toString
    assert(purePlan.contains("BroadcastNestedLoopJoin") ||
      purePlan.contains("CartesianProduct"),
      s"expected the pure range join to nested-loop:\n$purePlan")
    // equi key + band -> hash join with the band as a RESIDUAL filter:
    // every same-key pair is generated first, quadratic per hot key
    val keyed = clicks.join(views,
      clicks("user_id") === views("v_user") &&
        views("vts") >= clicks("ts") - expr("INTERVAL 1 HOUR") &&
        views("vts") <= clicks("ts"))
    val keyedPlan = keyed.queryExecution.executedPlan.toString
    assert(keyedPlan.contains("HashJoin") &&
      keyedPlan.contains("vts") && !keyedPlan.contains("__b"),
      s"expected a hash join with residual band condition:\n$keyedPlan")
  }

  test("empty window is rejected") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.banded(df, df.withColumnRenamed("t", "t2"), "k", "t", "t2", 0, 0)
    }
  }
}
