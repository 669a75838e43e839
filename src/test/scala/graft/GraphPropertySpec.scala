package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Graph

/** Property checks for the graph library APIs: on randomized graphs,
  * [[Graph.bfsDistances]] and [[Graph.cheapestPaths]] must agree with
  * independent plain-Scala references (JoinPropertySpec's style — raw
  * ScalaCheck generators, fixed seeds, one Spark job per case). The
  * real-corpus GraphSpec mirrors pin g3/g4 end to end; these pin the
  * CORE on shapes the co-order graph can't produce — disconnected
  * components, self-contained cliques, skewed weights, seed sets that
  * aren't the smallest ids.
  */
class GraphPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .take(n).toSeq

  /** (undirected edges with weights, seed nodes) over ≤ 12 nodes. */
  private val graphGen: Gen[(Seq[(Long, Long, Long)], Seq[Long])] = for {
    n <- Gen.choose(2, 12)
    pairs = for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)
    kept <- Gen.sequence[Seq[Option[((Long, Long), Long)]], Option[((Long, Long), Long)]](
      pairs.map { p =>
        for {
          keep <- Gen.prob(0.35)
          w <- Gen.choose(1L, 9L)
        } yield if (keep) Some((p, w)) else None
      })
    edges = kept.flatten.map { case ((a, b), w) => (a, b, w) }
    nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    if nodes.nonEmpty
    k <- Gen.choose(1, math.min(3, nodes.size))
    seeds <- Gen.pick(k, nodes)
  } yield (edges, seeds.toSeq)

  test("bfsDistances equals a plain-Scala BFS on random graphs") {
    samples(graphGen, 6, seed = 4242L).zipWithIndex.foreach {
      case ((edges, seeds), i) =>
        val hops = 3
        val adjDf = edges.flatMap { case (a, b, _) => Seq((a, b), (b, a)) }
          .toDF("u", "v")
        val got = Graph.bfsDistances(adjDf, seeds.toDF("part"), hops)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

        val adj = edges.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
        val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
        var frontier = seeds.toSet
        (1 to hops).foreach { h =>
          frontier = frontier.flatMap(x => adj.getOrElse(x, Set.empty))
            .filterNot(dist.contains)
          frontier.foreach(p => dist(p) = h.toLong)
        }
        assert(got == dist.toMap, s"case $i: edges=$edges seeds=$seeds")
    }
  }

  test("cheapestPaths equals a plain-Scala bounded Bellman-Ford on random graphs") {
    samples(graphGen, 6, seed = 77L).zipWithIndex.foreach {
      case ((edges, seeds), i) =>
        val rounds = 3
        val adjDf = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
          .toDF("u", "v", "cost")
        val got = Graph.cheapestPaths(adjDf, seeds.toDF("node"), rounds)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

        val dirAdj = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        val cost = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
        (1 to rounds).foreach { _ =>
          val snap = cost.toMap
          dirAdj.foreach { case (u, v, w) =>
            snap.get(u).foreach { cu =>
              if (!cost.contains(v) || cu + w < cost(v)) cost(v) = cu + w
            }
          }
        }
        assert(got == cost.toMap, s"case $i: edges=$edges seeds=$seeds")
    }
  }

  /** Plain-Scala peel to fixpoint: (core map node -> in-core degree,
    * rounds taken). The independent reference for [[Graph.kCore]].
    */
  private def peelRef(edges: Seq[(Long, Long)], k: Int): (Map[Long, Long], Int) = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, v) => (n, v.map(_._2).toSet) }
    var live = adj.keySet
    var rounds = 0
    var done = false
    while (!done) {
      val drop = live.filter(n => adj(n).count(live.contains) < k)
      if (drop.isEmpty) done = true
      else { live = live -- drop; rounds += 1 }
    }
    (live.iterator.map(n => (n, adj(n).count(live.contains).toLong)).toMap,
      rounds)
  }

  test("kCore equals a plain-Scala peel on random graphs (sizes, members, in-core degrees)") {
    samples(graphGen, 6, seed = 909L).zipWithIndex.foreach {
      case ((wedges, _), i) =>
        val edges = wedges.map { case (a, b, _) => (a, b) }
        val adjDf = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
          .toDF("u", "v")
        (2 to 4).foreach { k =>
          val got = Graph.kCore(adjDf, k)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          val (want, _) = peelRef(edges, k)
          assert(got == want, s"case $i k=$k: edges=$edges")
        }
    }
  }

  test("labelPropagation equals a plain-Scala monotone weighted LPA on random graphs") {
    samples(graphGen, 6, seed = 5151L).zipWithIndex.foreach {
      case ((edges, _), i) =>
        val rounds = 4
        val adjDf = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
          .toDF("u", "v", "w")
        val got = Graph.labelPropagation(adjDf, rounds)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

        val nbr = edges.flatMap { case (a, b, w) => Seq((a, (b, w)), (b, (a, w))) }
          .groupBy(_._1).map { case (n, v) => (n, v.map(_._2)) }
        var labels: Map[Long, Long] = nbr.keys.map(n => (n, n)).toMap
        (1 to rounds).foreach { _ =>
          val snap = labels
          labels = nbr.map { case (n, vs) =>
            val votes = vs.groupBy { case (v, _) => snap(v) }
              .map { case (l, es) => (l, es.map(_._2).sum) }
            // plurality proposal (max weight, smallest label on ties),
            // adopted only when smaller than the current label
            val prop = votes.toSeq.minBy { case (l, s) => (-s, l) }._1
            (n, math.min(snap(n), prop))
          }
        }
        assert(got == labels, s"case $i: edges=$edges")

        // monotone-LPA invariants: no label exceeds its node id, and
        // every label is a real node of the same component
        assert(got.forall { case (n, l) => l <= n })
    }
  }

  test("g9 corpus mirror: per-community modularity equals a plain-Scala recompute") {
    val strongAdj = Graph.coAdj(spark, TestSpark.sf).filter($"w" >= 3)
    val labels = Graph.labelPropagation(strongAdj, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = strongAdj.filter($"u" < $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val w = edges.map(_._3).sum
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (u, v, ew) =>
      deg(u) = deg.getOrElse(u, 0L) + ew; deg(v) = deg.getOrElse(v, 0L) + ew
    }
    val degC = deg.toSeq.groupBy { case (n, _) => labels(n) }
      .map { case (l, xs) => (l, (xs.map(_._2).sum, xs.size.toLong)) }
    val inC = edges.filter { case (u, v, _) => labels(u) == labels(v) }
      .groupBy { case (u, _, _) => labels(u) }
      .map { case (l, es) => (l, es.map(_._3).sum) }
    val want = degC.toSeq.sortBy(_._1).map { case (l, (dw, n)) =>
      val in = inC.getOrElse(l, 0L)
      val s = dw * 1000000L / (2L * w) // non-negative: / == div
      (l, n, in, dw, in * 1000000L / w - (s * s) / 1000000L)
    }
    val got = Graph.g9Modularity(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
    // the gauge is meaningful, not vacuous: the partition as a whole
    // beats the random-graph expectation (Q > 0), and weak communities
    // (q <= 0) are allowed to exist — surfacing them is the point
    assert(got.map(_._5).sum > 0, "aggregate modularity not positive")
    assert(got.exists(_._5 > 0))
  }

  test("g10 corpus mirror: resource-allocation scores equal a plain-Scala recompute") {
    val adjRows = Graph.coAdj(spark, TestSpark.sf).filter($"w" >= 2)
      .select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nbr = adjRows.groupBy(_._1).map { case (u, vs) => (u, vs.map(_._2).toSet) }
    val edgeSet = adjRows.toSet
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    nbr.foreach { case (center, vs) =>
      val deg = vs.size.toLong
      val sorted = vs.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.size) {
        val key = (sorted(i), sorted(j))
        val (c0, r0) = scores.getOrElse(key, (0L, 0L))
        scores(key) = (c0 + 1L, r0 + 1000000L / deg)
      }
    }
    val want = scores.toSeq
      .filterNot { case ((a, b), _) => edgeSet.contains((a, b)) }
      .map { case ((a, b), (c, r)) => (a, b, c, r) }
      .sortBy { case (a, b, _, r) => (-r, a, b) }
      .take(20)
    val got = Graph.g10ResourceAlloc(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
    // the degree normalization is live: scores are not all equal (a
    // pure common-neighbor count would make them so on pair-heavy tiers)
    assert(got.map(_._4).distinct.size > 1)
  }

  test("g6 corpus mirror: the real peel converges inside the oracle's unroll and the core is maximal") {
    val strong = Graph.coAdj(spark, TestSpark.sf)
      .filter($"u" < $"v" && $"w" >= 2)
      .select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (want, rounds) = peelRef(strong, 3)
    assert(rounds <= Graph.CorePeelUnroll,
      s"peel took $rounds rounds; oracle unrolls only ${Graph.CorePeelUnroll} — raise CorePeelUnroll")
    assert(want.nonEmpty, "3-core of the w>=2 graph is empty — the query went degenerate")
    val got = Graph.g6Kcore(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // core property: every member keeps >= k in-core neighbors
    assert(want.values.forall(_ >= 3))
  }
}
