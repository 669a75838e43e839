package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** AS-OF join semantics (the §2.4 extension behind j5_asof_join). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), "l1"),
    (1L, ts("2024-01-01 12:00:00"), "l2"),
    (2L, ts("2024-01-01 09:00:00"), "l3"), // before any right row for key 2
    (3L, ts("2024-01-01 10:00:00"), "l4")  // key with no right rows at all
  ).toDF("k", "lts", "ltag")

  private val right = Seq(
    (1L, ts("2024-01-01 09:30:00"), 9.5),
    (1L, ts("2024-01-01 10:00:00"), 10.0), // equal-ts tie with l1 -> inclusive
    (1L, ts("2024-01-01 11:00:00"), 11.0),
    (2L, ts("2024-01-01 09:30:00"), 93.0)
  ).toDF("k", "rts", "rate")

  test("each left row gets the latest right row at or before it; inner drops unmatched") {
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts")
      .orderBy("k", "lts").collect()
    assert(out.map(r => (r.getString(2), r.getDouble(4))).toSeq ==
      Seq(("l1", 10.0), ("l2", 11.0))) // equal-ts matches; l3/l4 dropped
  }

  test("left variant keeps unmatched rows null-padded") {
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts", joinType = "left")
      .orderBy("k", "lts").collect()
    assert(out.length == left.count())
    val unmatched = out.filter(_.isNullAt(3)).map(_.getString(2)).toSet
    assert(unmatched == Set("l3", "l4"))
  }

  test("forward direction: earliest right at or after, inclusive at equal ts") {
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts",
      direction = "forward").orderBy("k", "lts").collect()
    // l1@10:00 -> r@10:00 (inclusive), l2@12:00 -> none (dropped),
    // l3@09:00 -> r@09:30, l4 -> none
    assert(out.map(r => (r.getString(2), r.getDouble(4))).toSeq ==
      Seq(("l1", 10.0), ("l3", 93.0)))
  }

  test("tolerance discards matches further than the bound") {
    // l2@12:00's backward match is r@11:00 — 1 h away; a 30 min
    // tolerance must discard it, a 2 h tolerance must keep it
    val tight = AsOfJoin.asOf(left, right, "k", "lts", "rts",
      tolerance = Some("30 minutes")).orderBy("k", "lts").collect()
    assert(tight.map(r => (r.getString(2), r.getDouble(4))).toSeq ==
      Seq(("l1", 10.0))) // l2's stale match gone
    val loose = AsOfJoin.asOf(left, right, "k", "lts", "rts",
      tolerance = Some("2 hours")).orderBy("k", "lts").collect()
    assert(loose.map(r => (r.getString(2), r.getDouble(4))).toSeq ==
      Seq(("l1", 10.0), ("l2", 11.0)))
    // left join + tolerance: the discarded match null-pads instead
    val padded = AsOfJoin.asOf(left, right, "k", "lts", "rts",
      joinType = "left", tolerance = Some("30 minutes"))
      .orderBy("k", "lts").collect()
    assert(padded.length == 4)
    assert(padded.filter(_.isNullAt(3)).map(_.getString(2)).toSet ==
      Set("l2", "l3", "l4"))
  }

  test("no join fan-out: the plan is union+window, not a range join") {
    val df = AsOfJoin.asOf(left, right, "k", "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected a join-free plan:\n$plan")
    assert(plan.contains("Window"), s"expected a window operator:\n$plan")
  }

  test("matches the naive O(LxR) encoding on real data (j5 shape)") {
    val ev = graft.lake.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_id"))
    val fast = AsOfJoin.asOf(clicks, views, "user_id", "ts", "view_ts")
      .select("event_id", "view_id")
    val naive = clicks.join(views, Seq("user_id"))
      .filter(col("view_ts") <= col("ts"))
      .groupBy("event_id")
      .agg(max_by(col("view_id"), struct(col("view_ts"), col("view_id"))).as("view_id"))
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "as-of result differs from the naive reference")
  }

  test("null timestamps never match (either side, either direction)") {
    // a null-rts right row used to sort to the partition edge and be
    // carried as a spurious nearest match; null-lts left rows picked
    // one up under forward. Timestamp-comparison semantics: no match.
    val nl = left.union(Seq((1L, null.asInstanceOf[java.sql.Timestamp], "lnull"))
      .toDF("k", "lts", "ltag"))
    val nr = right.union(Seq((1L, null.asInstanceOf[java.sql.Timestamp], 666.0))
      .toDF("k", "rts", "rate"))
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin.asOf(nl, nr, "k", "lts", "rts",
        joinType = "left", direction = dir).collect()
      assert(out.length == nl.count(), s"$dir lost rows")
      // the null-ts left row is null-padded, never enriched
      val lnull = out.filter(r => !r.isNullAt(1) == false && r.getString(2) == "lnull")
      assert(lnull.forall(_.isNullAt(3)), s"$dir: null-lts row matched: ${lnull.mkString}")
      // no row anywhere matched the null-rts right row
      assert(!out.exists(r => !r.isNullAt(4) && r.getDouble(4) == 666.0),
        s"$dir: null-rts right row leaked into a match")
    }
  }

  test("overlapping non-key column names are rejected") {
    val bad = right.withColumnRenamed("rts", "lts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, bad, "k", "lts", "lts")
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
