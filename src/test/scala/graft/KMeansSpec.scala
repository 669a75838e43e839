package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.Tables
import graft.sim.KMeans

/** Spherical k-means + SemDeDup: iteration improves the objective, the
  * assignment is a partition of the corpus, the dedup keep-policy is
  * consistent, and the assignment plan has the claimed scale shape
  * (broadcast join, argmax collapsed before the one exchange).
  */
class KMeansSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val corpus = Tables.embeddings(spark, sf)

  test("every vector lands in exactly one cluster") {
    val a = KMeans.kMeans(spark, sf, iters = 1)
    assert(a.count() == corpus.count())
    assert(a.select("vec_id").distinct().count() == corpus.count())
    // clusters are seeded ids — all from the seed set
    val seeds = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val used = a.select("cluster").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(seeds))
  }

  test("Lloyd iterations do not degrade the objective") {
    // spherical k-means' mean assignment cosine is non-decreasing per
    // exact Lloyd step; the fixed-point snap perturbs centroids by
    // ≤ 1e-6 per dim, so allow that much slack
    val i1 = KMeans.inertia(KMeans.kMeans(spark, sf, iters = 1))
    val i3 = KMeans.inertia(KMeans.kMeans(spark, sf, iters = 3))
    assert(i3 >= i1 - 1e-4, s"objective degraded: $i1 -> $i3")
  }

  test("updateCentroids is deterministic across partitionings") {
    // the fixed-point accumulation claim: same centroids whatever the
    // partition layout (what a raw double sum does NOT guarantee)
    val a = KMeans.kMeans(spark, sf, iters = 1)
    def cents(parts: Int) = KMeans.updateCentroids(a.repartition(parts))
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(cents(2).sameElements(cents(7)))
  }

  test("semdedup pairs are within-cluster, ordered, and thresholded") {
    val a = KMeans.kMeans(spark, sf, iters = 1)
      .select(col("vec_id"), col("cluster").as("c2"))
    val p = KMeans.s6Semdedup(spark, sf)
    assert(p.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(p.filter(col("cos") < 0.30).count() == 0)
    val misjoined = p
      .join(a, p("vec_a") === a("vec_id"))
      .filter(col("cluster") =!= col("c2")).count()
    assert(misjoined == 0, "pair attributed to a cluster its member is not in")
  }

  test("dropSemanticDuplicates keeps exactly the non-losers") {
    val losers = KMeans.s6Semdedup(spark, sf)
      .select(col("vec_b")).distinct().count()
    val kept = KMeans.dropSemanticDuplicates(spark, sf).count()
    assert(kept == corpus.count() - losers)
  }

  test("label outliers: a planted cross-labeled vector surfaces at rank 1") {
    import spark.implicits._
    // two tight orthogonal clusters; vec 99 carries cluster-B geometry
    // under label 0 — the classic mislabeled example
    def vec(axis: Int, wiggle: Float) =
      Array.tabulate(4)(i => if (i == axis) 1f else if (i == 3) wiggle else 0f)
    val rows = Seq(
      (1L, vec(0, 0.01f), 0), (2L, vec(0, 0.02f), 0), (3L, vec(0, 0.03f), 0),
      (11L, vec(1, 0.01f), 1), (12L, vec(1, 0.02f), 1), (13L, vec(1, 0.03f), 1),
      (99L, vec(1, 0.00f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = KMeans.labelOutliers(rows, k = 1)
      .select("label", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(out(0) == 99L, s"planted mislabel should be label 0's outlier: $out")
  }

  test("assignment: broadcast join, argmax collapses before the one exchange") {
    val cents = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    val a = KMeans.assign(corpus, cents)
    a.write.format("noop").mode("overwrite").save()
    def walk[T](p: org.apache.spark.sql.execution.SparkPlan)(
        f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
      val self = f.lift(p).toSeq
      val kids = p match {
        case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(ad.executedPlan)(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)(f)
        case other => other.children.flatMap(walk(_)(f))
      }
      self ++ kids
    }
    val plan = a.queryExecution.executedPlan
    val shuffles = walk(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.length == 1,
      s"assignment should shuffle once (the final argmax agg), got " +
        s"${shuffles.length}:\n$plan")
    val bnl = walk(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.nonEmpty, s"centroid join should broadcast:\n$plan")
    // the k-candidates-per-vector stream collapses in the map task: a
    // partial aggregate must sit BELOW the shuffle (its child subtree)
    val partialBelowShuffle = walk(shuffles.head.asInstanceOf[
        org.apache.spark.sql.execution.SparkPlan]) {
      case ag: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if ag.aggregateExpressions.exists(_.mode ==
            org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => ag
    }
    assert(partialBelowShuffle.nonEmpty,
      s"no partial argmax below the exchange:\n$plan")
  }
}
