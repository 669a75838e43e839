package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

/** [[graft.ops.PrefixSum.runningBefore]] — the two-pass distributed
  * prefix sum that replaced the per-lang running-sum window in the
  * packing family (r13 verdict #1). Pins:
  *   1. bit-identity with the single-window form, for every bucket
  *      width (the width is a pure plan knob), on adversarial data
  *      (negative ords, sparse ords, bucket-straddling runs);
  *   2. t10's output unchanged vs an inline window-form reference on
  *      the corpus;
  *   3. the plan: the corpus-sized window partitions on
  *      (shard, bucket) — NEVER on the 5-value shard alone — and the
  *      offsets come back via broadcast.
  */
class PrefixSumSpec extends AnyFunSuite {
  import TestSpark._

  private def windowForm(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("shard").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("run", coalesce(sum("v").over(w), lit(0L)))
  }

  test("bit-identical to the window form across bucket widths, incl. negative/sparse ords") {
    val rng = new scala.util.Random(42)
    // sparse, negative-spanning ords: integral `div` truncates toward
    // zero but stays MONOTONE, which is all bucketing needs — this is
    // the case that would break a floor/trunc confusion
    val rows = (0 until 400).map { i =>
      (s"s${i % 3}", i * 37L - 2000L + (i % 5), rng.nextInt(1000).toLong)
    }.distinct
    import spark.implicits._
    val df = rows.toDF("shard", "ord", "v")
    val want = windowForm(df).select("shard", "ord", "run")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    for (w <- Seq(1L, 7L, 4096L)) {
      val got = PrefixSum.runningBefore(df, "shard", "ord", "v", "run", w)
        .select("shard", "ord", "run")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want, s"width $w diverged from the window form")
    }
  }

  test("t10 pack assignment identical to the retired per-lang window form") {
    val docs = graft.lake.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("int").as("n_tokens"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("tok_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr("tok_before div 2048L").as("pack_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    val got = graft.text.TextAnalysis.t10PackDocs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(got == want, "t10's prefix-sum form changed the pack assignment")
  }

  test("plan: corpus window partitions on (shard, bucket), offsets broadcast back") {
    val df = graft.text.TextAnalysis.t35PackDocsTrained(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(q.plan)
        case other => other.children.flatMap(nodes)
      }
      p +: (kids ++ p.subqueries.flatMap(nodes))
    }
    val all = nodes(df.queryExecution.executedPlan)
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected WindowExec nodes in the pack plan")
    // the corpus-sized running sum must carry the bucket column in its
    // partition spec; the ONLY single-key window allowed is the offsets
    // scan, whose input subtree is the (N/W-row) subtotal AGGREGATE
    windows.foreach { w =>
      val spec = w.partitionSpec.map(_.sql).mkString(",")
      if (w.partitionSpec.size < 2) {
        val reduced = nodes(w).exists {
          case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
          case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
          case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
          case _ => false
        }
        assert(reduced,
          s"single-key window [$spec] runs over an UNREDUCED relation — " +
            s"the per-lang one-task ceiling is back:\n$w")
      } else assert(spec.contains("__ps_b"),
        s"multi-key window [$spec] lacks the prefix-sum bucket column")
    }
    assert(all.exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _ => false
    }, "offsets must come back via a broadcast join")
  }
}
