package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Graph
import graft.lake.Tables

/** g1 PageRank: the DuckDB oracle pins cross-engine values; this spec
  * pins the recurrence itself against an independent plain-Scala
  * implementation (exact integer equality — both floor once per edge
  * per iteration), and the physical shape.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("g1: iteration-5 ranks equal a plain-Scala PageRank, bit for bit") {
    val got = Graph.g1Pagerank(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    assert(got.nonEmpty)

    // independent reference from the raw tables
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val om = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairW = li.flatMap { case (ok, sk) => om.get(ok).map(ck => (ck, sk)) }
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val edges = pairW.toSeq.flatMap { case ((ck, sk), w) =>
      Seq((ck * 2, sk * 2 + 1, w), (sk * 2 + 1, ck * 2, w))
    }
    val wout = edges.groupBy(_._1).map { case (s0, es) => (s0, es.map(_._3).sum) }
    val n = wout.size.toLong
    // per-node mass grain (r10): r0 = 1e6 each — the graph-PPM grain
    // (1e6 div n) underflows to zero above a million nodes
    var rank: Map[Long, Long] = wout.map { case (u, _) => (u, 1000000L) }
    (1 to 5).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (u, v, w) =>
        in(v) = in.getOrElse(v, 0L) + rank(u) * 85L * w / (100L * wout(u))
      }
      rank = in.map { case (v, m) => (v, 150000L + m) }.toMap
    }
    val want = rank.toSeq.map { case (node, r) =>
      ((if (node % 2 == 0) "customer" else "supplier", node / 2), r)
    }.sortBy { case ((t, k), r) => (-r, t, k) }.take(100)
    assert(got.toSeq == want,
      s"first mismatch: ${got.toSeq.zip(want).find(p => p._1 != p._2)}")
  }

  test("g2: per-part triangle counts equal brute enumeration on the real graph") {
    val got = Graph.g2Triangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty, "no triangles in the co-order graph fixture")

    // brute reference: materialize the distinct edge set, enumerate all
    // node triples via adjacency intersection
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      (adj(a) intersect adj(b)).foreach { c =>
        if (c > b) { // a < b < c: each triangle once
          Seq(a, b, c).foreach(x =>
            triCount(x) = triCount.getOrElse(x, 0L) + 1L)
        }
      }
    }
    val want = triCount.toSeq.sortBy { case (p, t) => (-t, p) }.take(20)
    assert(got.toSeq == want,
      s"got ${got.toSeq.take(5)}... want ${want.take(5)}...")
  }

  test("g3: hop histogram equals a plain-Scala BFS on the real graph") {
    val got = Graph.g3BfsDistance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)

    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Set[Long]] = op.groupBy(_._1).values.toSeq
      .flatMap { ps =>
        val parts: Seq[Long] = ps.map(_._2).distinct.toSeq
        for { a <- parts; b <- parts if a != b } yield (a, b)
      }.distinct.groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).toSet) }
    val seeds = adj.keySet.toSeq.sorted.take(5)
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    var frontier = seeds.toSet
    (1 to 4).foreach { i =>
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      frontier.foreach(p => dist(p) = i.toLong)
    }
    val want = dist.toSeq.groupBy(_._2).toSeq.map { case (d, ps) =>
      (d, ps.size.toLong, ps.map(_._1).min, ps.map(_._1).max)
    }.sortBy(_._1)
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }

  test("g4: bounded-hop cheapest costs equal a plain-Scala Bellman-Ford") {
    val got = Graph.g4CheapestPath(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)

    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val w: Map[(Long, Long), Long] = op.groupBy(_._1).values.toSeq
      .flatMap { ps =>
        val parts: Seq[Long] = ps.map(_._2).distinct.sorted.toSeq
        for { i <- parts.indices; j <- i + 1 until parts.length }
          yield (parts(i), parts(j))
      }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val adj: Seq[(Long, Long, Long)] = w.toSeq.flatMap { case ((a, b), n) =>
      val c = 1000000L / n
      Seq((a, b, c), (b, a, c))
    }
    val nodes = adj.map(_._1).distinct.sorted
    val dist = scala.collection.mutable.Map(
      nodes.take(5).map(_ -> 0L): _*)
    (1 to 4).foreach { _ =>
      val snapshot = dist.toMap
      adj.foreach { case (u, v, c) =>
        snapshot.get(u).foreach { du =>
          if (!dist.contains(v) || du + c < dist(v)) dist(v) = du + c
        }
      }
    }
    val want = dist.toSeq.map { case (p, c) => (p, c) }
      .sortBy { case (p, c) => (c, p) }.take(100)
    assert(got.toSeq == want,
      s"first mismatch: ${got.toSeq.zip(want).find(p => p._1 != p._2)}")
  }

  test("g7: top-20 Jaccard link predictions equal brute common-neighbor scoring") {
    val got = Graph.g7LinkPredict(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty, "no non-adjacent candidate pairs in the fixture graph")

    // brute reference: weighted co-order pairs from the raw tables,
    // w >= 2 adjacency sets, all-pairs intersection scoring
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    op.groupBy(_._1).values.foreach { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        w((parts(i), parts(j))) = w.getOrElse((parts(i), parts(j)), 0L) + 1L
    }
    // NB: .toSeq first — collect straight off the Map would rebuild a
    // Map from the yielded (a, b) tuples, collapsing each a to one edge
    val strong = w.toSeq.collect { case (p, c) if c >= 2 => p }.toSet
    val adj = strong.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      i <- nodes.indices; j <- i + 1 until nodes.length
      a = nodes(i); b = nodes(j)
      if !strong((a, b))
      common = (adj(a) intersect adj(b)).size.toLong
      if common > 0
    } yield (a, b, common,
        common * 1000000L / (adj(a).size + adj(b).size - common)))
      .sortBy { case (a, b, _, jac) => (-jac, a, b) }.take(20)
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")
    // every emitted candidate is genuinely a NON-edge with shared support
    got.foreach { case (a, b, c, _) =>
      assert(!strong((a, b)) && c > 0) }
  }

  test("g2: degree-ordered orientation — every edge points to the higher (deg, node) rank") {
    // tiny planted graph exercised through the same public query path is
    // impractical (it reads lineitem), so pin the invariant on the real
    // graph's plan output instead: total triangles from the query equal
    // the brute total (covered above); here assert no cartesian and no
    // parquet rescan after the checkpointed orientation
    val plan = Graph.g2Triangles(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in g2:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in g2:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"wedge/closing joins re-read the fact tables:\n$plan")
  }

  test("lpaLabels memo: g8/g9 share one propagation run; a corpus rewrite re-propagates bit-identically (r12 verdict #5)") {
    // private tier copy so the mtime bump can't perturb other suites
    val dir = java.nio.file.Files.createTempDirectory("lpa_memo")
    Seq("lineitem.parquet", "orders.parquet").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf, t), dir.resolve(t))
    }
    val d = dir.toString
    // sorted: labels/g-outputs are compared as relations (no ORDER BY
    // on the label state; partition order is not part of the contract)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted

    val first = Graph.lpaLabels(spark, d)
    val baseLabels = rows(first)
    val g8 = rows(Graph.g8Communities(spark, d))
    val g9 = rows(Graph.g9Modularity(spark, d))
    assert(baseLabels.nonEmpty && g8.nonEmpty && g9.nonEmpty)

    // a HIT returns the SAME materialized state (eq, not just equal):
    // g9 consumed g8's run, no second propagation happened
    assert(Graph.lpaLabels(spark, d) eq first,
      "second lpaLabels call re-propagated despite an unchanged corpus")

    // staleness: an mtime bump moves the tier signature — the memo
    // re-propagates (fresh DataFrame) and, the corpus bytes being
    // unchanged, lands on bit-identical labels and query outputs
    java.nio.file.Files.setLastModifiedTime(
      dir.resolve("lineitem.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))
    val re = Graph.lpaLabels(spark, d)
    assert(!(re eq first), "stale labels served after a corpus rewrite")
    assert(rows(re) == baseLabels, "re-propagated labels diverged")
    assert(rows(Graph.g8Communities(spark, d)) == g8)
    assert(rows(Graph.g9Modularity(spark, d)) == g9)
  }

  test("refinedLabels memo: g11-g14 share one gain round; staleness re-refines bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("refine_memo")
    Seq("lineitem.parquet", "orders.parquet").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf, t), dir.resolve(t))
    }
    val d = dir.toString
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted

    val first = Graph.refinedLabels(spark, d)
    val base = rows(first)
    val g11 = rows(Graph.g11LouvainRefine(spark, d))
    val g13 = rows(Graph.g13LouvainLevel2(spark, d))
    assert(base.nonEmpty && g11.nonEmpty && g13.nonEmpty)
    assert(Graph.refinedLabels(spark, d) eq first,
      "second refinedLabels call re-refined despite an unchanged corpus")
    // and the memo equals an unmemoized refine over the same state
    assert(rows(Graph.louvainRefine(
        Graph.coAdj(spark, d).filter(
          org.apache.spark.sql.functions.col("w") >= Graph.MinCoOrders),
        Graph.lpaLabels(spark, d))) == base,
      "memoized refined labels != a direct refine run")

    java.nio.file.Files.setLastModifiedTime(
      dir.resolve("lineitem.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))
    val re = Graph.refinedLabels(spark, d)
    assert(!(re eq first), "stale refined labels served after a rewrite")
    assert(rows(re) == base, "re-refined labels diverged")
    assert(rows(Graph.g11LouvainRefine(spark, d)) == g11)
    assert(rows(Graph.g13LouvainLevel2(spark, d)) == g13)
  }

  test("g11 local move: exact modularity non-decreasing vs g8's partition; every adopted move had positive gain (r12 verdict stretch #9)") {
    import org.apache.spark.sql.functions._
    val adj = Graph.coAdj(spark, sf).filter(col("w") >= Graph.MinCoOrders)
      .localCheckpoint()
    val before = Graph.lpaLabels(spark, sf)
    val after = Graph.louvainRefine(adj, before)

    // exact plain-Scala modularity (double arithmetic on the collected
    // graph — no ppm floors, so the comparison is the REAL objective)
    val edges = adj.filter(col("u") < col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w2 = 2.0 * edges.map(_._3).sum
    def q(labels: Map[Long, Long]): Double = {
      val inC = edges.groupMapReduce(e =>
        if (labels(e._1) == labels(e._2)) Some(labels(e._1)) else None)(
        _._3.toDouble)(_ + _)
      val degC = edges.flatMap(e =>
        Seq(labels(e._1) -> e._3.toDouble, labels(e._2) -> e._3.toDouble))
        .groupMapReduce(_._1)(_._2)(_ + _)
      degC.map { case (c, dc) =>
        inC.getOrElse(Some(c), 0.0) / (w2 / 2) - math.pow(dc / w2, 2)
      }.sum
    }
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lb = toMap(before)
    val la = toMap(after)
    assert(la.keySet == lb.keySet, "refinement changed the node set")
    val qb = q(lb)
    val qa = q(la)
    assert(qa >= qb - 1e-12,
      f"local-move round DECREASED modularity: $qb%.6f -> $qa%.6f — " +
        "the synchronous adopt lost its empirical monotonicity on this " +
        "corpus; stage the movers (see g11 docstring)")
    assert(la.exists { case (n, l) => lb(n) != l },
      "fixture regression: the local-move round moved nothing")
  }

  test("g13 level 2: mapped-back partition's exact modularity ≥ g11's; contraction conserves degree and total weight") {
    import org.apache.spark.sql.functions._
    val adj = Graph.coAdj(spark, sf).filter(col("w") >= Graph.MinCoOrders)
      .localCheckpoint()
    val l1 = Graph.louvainRefine(adj, Graph.lpaLabels(spark, sf))
      .localCheckpoint()
    val adj2 = Graph.contractedAdjacency(adj, l1).localCheckpoint()

    // the contraction invariants the level-2 gains rely on: Σ degree
    // and total edge weight (self-loops at w div 2) equal the original
    // graph's — otherwise level 2 optimizes a different objective
    val degSum = adj.agg(sum("w")).head.getLong(0)
    val degSum2 = adj2.agg(sum("w")).head.getLong(0)
    assert(degSum2 == degSum,
      s"contraction changed total degree mass: $degSum2 != $degSum")
    val w1 = adj.filter(col("u") < col("v")).agg(sum("w")).head.getLong(0)
    val w2c = adj2.filter(col("u") <= col("v"))
      .agg(sum(when(col("u") === col("v"), expr("w div 2"))
        .otherwise(col("w")))).head.getLong(0)
    assert(w2c == w1, s"contraction changed total edge weight: $w2c != $w1")

    // level-2 mutual-best merge on the contracted graph, mapped back.
    // (The naive alternative — louvainRefine run synchronously on the
    // super-graph — DECREASED exact modularity here, 0.3446 -> 0.3368:
    // all 33 super-nodes moved at once. The merge round's docstring
    // carries the theorem this spec verifies empirically.)
    val l2c = Graph.mergeCommunitiesRound(adj2)
    val labels2 = l1
      .join(l2c.select(col("node").as("label"), col("label").as("l2")),
        "label")
      .select(col("node"), col("l2").as("label"))

    // exact plain-Scala modularity (the g11 test's gauge — no floors)
    val edges = adj.filter(col("u") < col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w2 = 2.0 * edges.map(_._3).sum
    def q(labels: Map[Long, Long]): Double = {
      val inC = edges.groupMapReduce(e =>
        if (labels(e._1) == labels(e._2)) Some(labels(e._1)) else None)(
        _._3.toDouble)(_ + _)
      val degC = edges.flatMap(e =>
        Seq(labels(e._1) -> e._3.toDouble, labels(e._2) -> e._3.toDouble))
        .groupMapReduce(_._1)(_._2)(_ + _)
      degC.map { case (c, dc) =>
        inC.getOrElse(Some(c), 0.0) / (w2 / 2) - math.pow(dc / w2, 2)
      }.sum
    }
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m1 = toMap(l1)
    val m2 = toMap(labels2)
    assert(m2.keySet == m1.keySet, "level 2 changed the node set")
    val q1 = q(m1)
    val q2 = q(m2)
    assert(q2 >= q1 - 1e-12,
      f"level 2 DECREASED modularity: $q1%.6f -> $q2%.6f — the " +
        "synchronous whole-community adopt lost monotonicity here")
    // fixture: on this corpus level 2 genuinely merges communities
    // (33 -> 21 at sf0.001) — a vacuous no-move pass would pin nothing
    assert(m2.values.toSet.size < m1.values.toSet.size,
      "fixture regression: level 2 merged no communities at this tier")
  }

  test("g14 hierarchy: exact modularity non-decreasing across every merge level; deeper than one level on this corpus") {
    import org.apache.spark.sql.functions._
    val adj = Graph.coAdj(spark, sf).filter(col("w") >= Graph.MinCoOrders)
      .localCheckpoint()
    var labels = Graph.louvainRefine(adj, Graph.lpaLabels(spark, sf))
      .localCheckpoint()
    val edges = adj.filter(col("u") < col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w2 = 2.0 * edges.map(_._3).sum
    def q(m: Map[Long, Long]): Double = {
      val inC = edges.groupMapReduce(e =>
        if (m(e._1) == m(e._2)) Some(m(e._1)) else None)(_._3.toDouble)(_ + _)
      val degC = edges.flatMap(e =>
        Seq(m(e._1) -> e._3.toDouble, m(e._2) -> e._3.toDouble))
        .groupMapReduce(_._1)(_._2)(_ + _)
      degC.map { case (c, dc) =>
        inC.getOrElse(Some(c), 0.0) / (w2 / 2) - math.pow(dc / w2, 2)
      }.sum
    }
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var prevQ = q(toMap(labels))
    val sizes = scala.collection.mutable.ArrayBuffer(
      toMap(labels).values.toSet.size)
    (1 to Graph.MergeLevels).foreach { lvl =>
      val merged = Graph.mergeCommunitiesRound(
        Graph.contractedAdjacency(adj, labels).localCheckpoint())
      labels = labels
        .join(merged.select(col("node").as("label"), col("label").as("l2")),
          "label")
        .select(col("node"), col("l2").as("label"))
        .localCheckpoint()
      val m = toMap(labels)
      val ql = q(m)
      assert(ql >= prevQ - 1e-12,
        f"merge level $lvl DECREASED modularity: $prevQ%.6f -> $ql%.6f")
      prevQ = ql
      sizes += m.values.toSet.size
    }
    // the hierarchy genuinely coarsens BEYOND g13's single level here
    // (33 -> 23 -> fewer): a vacuous level-2+ pass would pin nothing
    assert(sizes(2) < sizes(1),
      s"level 2 merged nothing on this corpus: community counts $sizes")
  }

  test("g12 contraction: edge mass and edge count conserved; self-loops carry the internal weight") {
    import org.apache.spark.sql.functions._
    val adj = Graph.coAdj(spark, sf).filter(col("w") >= Graph.MinCoOrders)
      .localCheckpoint()
    val labels = Graph.louvainRefine(adj, Graph.lpaLabels(spark, sf))
    val edges = adj.filter(col("u") < col("v"))
    // the FULL contracted relation (the query's top-20 is its head):
    // every original edge lands on exactly one community pair, so the
    // contraction is a partition of the edge set — Σ n_edges = |E| and
    // Σ total_w = W, or the next Louvain level computes modularity
    // over a different graph than this one
    val contracted = edges
      .join(labels.select(col("node").as("u"), col("label").as("la")), "u")
      .join(labels.select(col("node").as("v"), col("label").as("lb")), "v")
      .select(least(col("la"), col("lb")).as("ca"),
        greatest(col("la"), col("lb")).as("cb"), col("w"))
      .groupBy("ca", "cb")
      .agg(count(lit(1)).as("n"), sum("w").as("tw"))
      .localCheckpoint()
    val want = edges.agg(count(lit(1)), sum("w")).head()
    val got = contracted.agg(sum("n"), sum("tw")).head()
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1),
      s"contraction lost edge mass: $got vs $want")
    assert(contracted.filter(col("ca") === col("cb")).count() > 0,
      "no self-loops — the contraction dropped internal community mass")
  }

  test("g1: no cartesian joins; edge relation is reused across iterations") {
    val df = Graph.g1Pagerank(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in g1:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in g1:\n$plan")
    // each iteration consumes the localCheckpoint'd edge RDD scan, not a
    // re-derivation from the fact tables: the final plan reads no parquet
    assert(!plan.contains("FileScan parquet"),
      s"iteration plan re-reads the fact tables:\n$plan")
  }
}
