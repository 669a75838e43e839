package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.SetSimilarity

/** AllPairs prefix-filtered exact Jaccard join (d10) and directed
  * set-containment join (d12): completeness vs the brute exact forms
  * (the defining guarantee LSH lacks), prefix-length arithmetic, and
  * adversarial shingle distributions.
  */
class SetSimilaritySpec extends AnyFunSuite {
  import TestSpark._

  test("prefix form equals brute exact form on the corpus (zero false negatives / positives)") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val fast = SetSimilarity.allPairs(docs).collect().toSeq
    val brute = SetSimilarity.bruteExact(docs).collect().toSeq
    assert(fast == brute)
    assert(fast.nonEmpty, "corpus should contain at least one tau>=0.6 pair")
  }

  test("containment form equals brute containment on the corpus") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val fast = SetSimilarity.containmentPairs(docs).collect().toSeq
    val brute = SetSimilarity.bruteContainment(docs).collect().toSeq
    assert(fast == brute)
    assert(fast.nonEmpty, "corpus should contain at least one cont>=0.8 pair")
  }

  test("adversarial synthetic corpus: boilerplate shingles, identical docs, disjoint docs, 1-shingle docs") {
    import spark.implicits._
    val docs = Seq(
      // overlapping 4-shingle sets: inter 3 of union 5 = 0.6 (boundary)
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      // identical text (jaccard 1.0)
      (3L, "omega psi chi tau nu"),
      (4L, "omega psi chi tau nu"),
      // one shared boilerplate shingle, low jaccard: 1 of 17
      (5L, "x y z a5 b5 c5 d5 e5 f5 g5"),
      (6L, "x y z a6 b6 c6 d6 e6 f6 g6"),
      // disjoint
      (7L, "seven7a seven7b seven7c seven7d"),
      // single-shingle exact twins
      (8L, "solo one two"),
      (9L, "solo one two"),
      // below the 3-token shingle floor: excluded entirely
      (10L, "tiny doc")
    ).toDF("doc_id", "text")
    val fast = SetSimilarity.allPairs(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = SetSimilarity.bruteExact(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast == brute)
    val pairs = fast.map { case (a, b, _) => (a, b) }.toSet
    assert(pairs == Set((1L, 2L), (3L, 4L), (8L, 9L)), s"got $pairs")
    val jac12 = fast.collectFirst { case (1L, 2L, j) => j }.get
    assert(jac12 == 6000L,
      s"expected 3/5 jaccard = 6000 bp (kept at the >= boundary), got $jac12")
    assert(fast.collectFirst { case (3L, 4L, j) => j }.contains(10000L))
  }

  test("containment: strict subset scores 10000 one way; direction and boundary are exact") {
    import spark.implicits._
    val docs = Seq(
      // A's 4 shingles are a strict subset of B's 8: C(A,B)=1.0,
      // C(B,A) = 4/8 = 0.5 (below tau, must NOT appear)
      (1L, "a b c d e f"),
      (2L, "a b c d e f g h i j"),
      // boundary: A has 5 shingles, 4 shared with C: C(A,C) = 0.8 exactly
      (3L, "p q r s t u v"),
      (4L, "p q r s t u zz yy xx"),
      // disjoint
      (5L, "one1 two2 three3 four4")
    ).toDF("doc_id", "text")
    val fast = SetSimilarity.containmentPairs(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = SetSimilarity.bruteContainment(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast == brute)
    val m = fast.map { case (a, b, c) => (a, b) -> c }.toMap
    assert(m.get((1L, 2L)).contains(10000L), s"subset pair missing: $fast")
    assert(!m.contains((2L, 1L)), s"reverse direction leaked: $fast")
    assert(m.get((3L, 4L)).contains(8000L),
      s"0.8 boundary pair missing (>= must keep it): $fast")
  }

  test("property: fast == brute for BOTH joins on random small-vocab corpora (prefix + positional + length prunes lose nothing)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny vocab forces heavy shingle sharing — the adversarial regime
    // for prefix pruning (high-df shingles, many near-boundary pairs)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docGen = for {
      len <- Gen.chooseNum(1, 12)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    (0 until 6).foreach { round =>
      val texts = (0 until 40 * 4).iterator
        .flatMap(i => docGen.apply(Gen.Parameters.default,
          Seed((round * 1000 + i).toLong)))
        .take(40).toSeq
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val fj = SetSimilarity.allPairs(docs).collect().toSeq
      val bj = SetSimilarity.bruteExact(docs).collect().toSeq
      assert(fj == bj, s"jaccard mismatch on round $round: $fj vs $bj")
      val fc = SetSimilarity.containmentPairs(docs).collect().toSeq
      val bc = SetSimilarity.bruteContainment(docs).collect().toSeq
      assert(fc == bc, s"containment mismatch on round $round: $fc vs $bc")
    }
  }

  test("clone clusters contract to one representative; expansion is complete on both joins") {
    import spark.implicits._
    // 3 clusters x 8 exact clones — the r8 degeneracy shape (the 100x
    // scale corpus's 26-apart rotation clones; any crawl's exact-dup
    // mass). Clusters 1 and 2 overlap at exactly tau (inter 3 / union
    // 5 = 0.6), so cross-group expansion is exercised alongside the
    // all-pairs within-group legs.
    val base = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon eta",
      "omega psi chi tau nu mu")
    val docs = (0 until 24).map { i =>
      (i.toLong, base(i % 3)) // interleaved ids: reps are NOT contiguous
    }.toDF("doc_id", "text")
    assert(SetSimilarity.groupedSets(SetSimilarity.hashedSets(docs))
      .count() == 3, "8 clones per set must contract to one row each")
    val fast = SetSimilarity.allPairs(docs).collect().toSeq
    val brute = SetSimilarity.bruteExact(docs).collect().toSeq
    assert(fast == brute)
    // 3 groups x C(8,2) within-pairs + 8x8 cross pairs of groups 0/1
    assert(fast.size == 3 * 28 + 64, s"got ${fast.size}")
    val fc = SetSimilarity.containmentPairs(docs).collect().toSeq
    val bc = SetSimilarity.bruteContainment(docs).collect().toSeq
    assert(fc == bc)
  }

  test("prefix relation is strictly smaller than the full shingle relation (the point of the filter)") {
    val ts = SetSimilarity.hashedSets(graft.lake.Tables.documents(spark, sf))
    val full = ts.select(col("doc_id"), explode(col("hs")).as("tok")).count()
    val pref = SetSimilarity.prefixes(ts).count()
    assert(pref < full, s"prefix $pref !< full $full")
    // tau=0.6 keeps |S| - ceil(0.6|S|) + 1 ≈ 0.4|S| + 1 shingles per doc
    assert(pref.toDouble / full < 0.6, s"prefix ratio ${pref.toDouble / full}")
  }
}
