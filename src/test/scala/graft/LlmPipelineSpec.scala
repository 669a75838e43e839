package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Dedup, TextAnalysis}
import graft.sim.Similarity

/** LLM-data-pipeline operator specs (dedup / similarity / text
  * analysis). Correctness vs DuckDB is the driver's gate; these tests
  * pin the SCALE-critical physical properties — the ones that decide
  * whether the operator survives 100 TB.
  */
class LlmPipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("every dedup/text/sim query runs and returns rows") {
    val all = Dedup.queries ++ TextAnalysis.queries ++ Similarity.queries
    all.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("t30: BPE merges equal an independent plain-Scala trainer (same pinned semantics)") {
    val got = TextAnalysis.t30BpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

    // independent reference: word counts -> 10 rounds of (count pairs,
    // argmax, pass-limited literal replace). Java String.replace is the
    // exact left-to-right non-overlapping scan the query's semantics
    // pins, so the reference shares ONLY the contract, not the code.
    val words = scala.collection.mutable.Map.empty[String, Long]
    graft.lake.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).foreach { t =>
        t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          .filter(_.length >= 2)
          .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L)
      }
    var state: Map[String, Long] = words.toMap.map { case (w, n) =>
      (" " + w.map(c => s"$c ").mkString, n)
    }
    val want = (1 to TextAnalysis.BpeMerges).map { i =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      state.foreach { case (st, n) =>
        val syms = st.trim.split(" ")
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          val pair = p.mkString(" ")
          counts(pair) = counts.getOrElse(pair, 0L) + n
        }
      }
      val (pair, cnt) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      val pat = s" $pair "
      val rep = " " + pair.replace(" ", "") + " "
      state = state.toSeq.map { case (st, n) =>
        var s2 = st
        (1 to TextAnalysis.BpeReplacePasses).foreach(_ => s2 = s2.replace(pat, rep))
        (s2, n)
      }.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
      (i, pair, pair.replace(" ", ""), cnt)
    }
    assert(got == want, s"got $got\nwant $want")

    // t31: the trained vocab equals the reference's final-state symbol
    // frequencies (top-20, freq desc / sym asc)
    val gotVocab = TextAnalysis.t31BpeVocab(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val freqs = scala.collection.mutable.Map.empty[String, Long]
    state.foreach { case (st, n) =>
      st.trim.split(" ").foreach(sy => freqs(sy) = freqs.getOrElse(sy, 0L) + n)
    }
    val wantVocab = freqs.toSeq.sortBy { case (sy, n) => (-n, sy) }.take(20)
    assert(gotVocab == wantVocab, s"got $gotVocab\nwant $wantVocab")
    // the learned units actually surface in the emitted vocab
    assert(want.map(_._3).exists(m => wantVocab.exists(_._1 == m)),
      "no merged symbol reached the top-20 vocab — the merges are dead weight on this corpus")
  }

  test("t33: trained-unit encoding equals a plain-Scala replay; 0 merges = char split") {
    val got = TextAnalysis.t33BpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    // independent reference: replay the trained merges (read back from
    // t30's output) with Java String.replace — the pinned semantics
    val merges = TextAnalysis.t30BpeTrain(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val docs = graft.lake.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, t) =>
      val ws = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        .filter(_.nonEmpty)
      val nts = ws.map { w =>
        var st = " " + w.map(c => s"$c ").mkString
        merges.foreach { case (pair, merged) =>
          (1 to TextAnalysis.BpeReplacePasses).foreach(_ =>
            st = st.replace(s" $pair ", s" $merged "))
        }
        st.count(_ == ' ').toLong - 1L
      }
      (id, ws.length.toLong, ws.map(_.length.toLong).sum, nts.sum)
    }.filter(_._2 > 0).sortBy(_._1).toSeq
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")

    // merges actually fire: trained units make at least one doc cheaper
    // than its character count (not a vacuous equality corpus)
    assert(got.exists(r => r._4 < r._3),
      "no merge fired anywhere — trained-unit counts degenerate to chars")

    // base case: encoding with ZERO merges is exactly character
    // splitting (n_tokens == n_chars per word)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wordsDf = Seq("hello", "a", "xyzzy", "bb").toDF("w")
    val st0 = TextAnalysis.bpeApply(
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")), Seq.empty)
    val zero = wordsDf.select(col("w"),
        (length(st0) - length(replace(st0, lit(" "), lit(""))) - 1).as("nt"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    zero.foreach { case (w, nt) =>
      assert(nt == w.length, s"0-merge encode of '$w' gave $nt tokens")
    }
  }

  test("t39 held-out scoring: the parity split genuinely exercises the unseen-transition floor") {
    import org.apache.spark.sql.functions.col
    // t39's point is putting scoreAgainstModel's left-join + floor
    // path behind the DuckDB hash gate — which only gauges anything
    // if the held-out side actually contains transitions the model
    // never saw (7 of 13,769 at sf0.01; this pins the sf0.001 gate
    // fixture stays non-vacuous too)
    val docs = graft.lake.Tables.documents(spark, sf)
    val model = TextAnalysis.bigramModel(docs.filter(col("doc_id") % 2 === 0))
    val unseen = TextAnalysis.docBigrams(docs.filter(col("doc_id") % 2 === 1))
      .join(model, Seq("w1", "w2"), "left_anti").count()
    assert(unseen > 0,
      "held-out split has no unseen transitions — the floor never fires")
  }

  test("t32 reuse path: OOV-floored batch scoring ranks unseen-transition text least fluent") {
    import spark.implicits._
    val docs = graft.lake.Tables.documents(spark, sf)
    val model = TextAnalysis.bigramModel(docs).localCheckpoint()

    // a later batch: one doc copied from the corpus (all transitions
    // known) and one all-OOV doc (no word appears in the corpus)
    val corpusText = docs.orderBy("doc_id").limit(1)
      .select("text").head().getString(0)
    val batch = Seq(
      (9000001L, corpusText),
      (9000002L, "zzqx qzzk xkqz zqkx wqzz")).toDF("doc_id", "text")
    val scored = TextAnalysis.scoreAgainstModel(batch, model, floorPpm = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // the all-OOV doc is PRESENT (an inner join would omit it) and
    // scores exactly the floor — every one of its 4 transitions is
    // unseen
    assert(scored.contains(9000002L), "all-OOV doc dropped from scoring")
    assert(scored(9000002L) == ((4L, 1L)),
      s"OOV doc must floor-score: ${scored(9000002L)}")
    // ...and ranks strictly less fluent than the in-distribution copy
    assert(scored(9000001L)._2 > 1L,
      s"corpus copy scored at the floor: ${scored(9000001L)}")

    // self-parity: on the training corpus the floor never fires, so
    // the reuse path reduces exactly to t32's self-scoring
    val self = TextAnalysis.scoreAgainstModel(docs, model).limit(20)
      .collect().map(_.toString).toSeq
    val t32 = TextAnalysis.t32BigramLm(spark, sf)
      .collect().map(_.toString).toSeq
    assert(self == t32, "reuse path diverged from self-scoring on the corpus")
  }

  test("t28: pair counts equal a plain-Scala recompute of within-word char bigrams") {
    val got = TextAnalysis.t28BpePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val texts = graft.lake.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      // mirror the query exactly: single-space split keeping empties,
      // ASCII-safe lowercase, within-word adjacent 2-char windows
      t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        .filter(_.length >= 2).foreach { w =>
          w.sliding(2).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1L)
        }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(30)
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")
  }

  test("t32: bigram-LM fluency scores equal a plain-Scala model trained on the same corpus") {
    val got = TextAnalysis.t32BigramLm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)

    // independent reference: MLE bigram counts -> integer-ppm
    // conditional probabilities -> floor-averaged per doc
    val docs = graft.lake.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docBigrams = docs.map { case (id, t) =>
      val tk = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      (id, tk.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq)
    }.filter(_._2.nonEmpty)
    val c12 = scala.collection.mutable.Map.empty[(String, String), Long]
    docBigrams.foreach(_._2.foreach(b => c12(b) = c12.getOrElse(b, 0L) + 1L))
    val c1 = c12.toSeq.groupBy(_._1._1)
      .map { case (w1, v) => (w1, v.map(_._2).sum) }
    val want = docBigrams.map { case (id, bs) =>
      val sp = bs.map(b => c12(b) * 1000000L / c1(b._1)).sum
      (id, bs.size.toLong, sp / bs.size)
    }.sortBy { case (id, _, avg) => (avg, id) }.take(20).toSeq
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")

    // the model is a probability measure per conditioning word: each
    // w1's floor'd conditional ppm sum lands in (1e6 - #bigrams, 1e6]
    val perW1 = c12.toSeq.groupBy(_._1._1).map { case (w1, v) =>
      (v.map { case (b, n) => n * 1000000L / c1(w1) }.sum, v.size)
    }
    perW1.foreach { case (s, k) =>
      assert(s <= 1000000L && s > 1000000L - k, s"ppm sum $s over $k bigrams")
    }
  }

  test("minhash LSH finds the planted near-duplicates with high Jaccard") {
    val jac = Dedup.d4NgramJaccard(spark, sf).collect()
    assert(jac.nonEmpty, "no candidate pair passed the 0.8 Jaccard verify")
    assert(jac.forall(_.getDouble(2) >= 0.8))
  }

  test("LSH candidate joins are bucketed equi-joins, never cartesian") {
    Seq(
      "d2" -> Dedup.d2MinhashLsh(spark, sf),
      "d3" -> Dedup.d3Simhash(spark, sf),
      "s2" -> Similarity.s2AnnLsh(spark, sf)
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("connectedComponents matches a plain-Scala union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 4).foreach { trial =>
      val edges = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: union-find, smaller root wins => root == component min
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(x => x -> find(x)).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("connectedComponents collapses a 20-node path (multi-round convergence)") {
    import spark.implicits._
    val path = (0L until 19L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(path.toDF("a", "b")).collect()
    assert(got.length == 20 && got.forall(_.getLong(1) == 0L))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(path.toDF("a", "b"), maxRounds = 0).collect()
    }
  }

  test("CC converges within the O(log² n) bound on adversarial topologies (r5 verdict #6)") {
    import spark.implicits._
    // The SoCC'14 round bound is what makes the iteration 100 TB-safe;
    // stress its two extremes at real (sf0.01-document-count) sizes.
    def log2(n: Int): Int = 32 - Integer.numberOfLeadingZeros(n - 1)
    // 1) long path — worst case for star contraction (diameter n):
    //    naive label propagation needs ~n rounds; the alternation must
    //    stay polylog. 4000 nodes ≈ the sf0.01 documents table.
    val n = 4000
    val path = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (pLabels, pRounds) = Dedup.connectedComponentsWithRounds(path)
    val pBound = log2(n) * log2(n) // ≥ the paper's O(log² n) with c=1
    assert(pRounds <= pBound, s"path: $pRounds rounds > log²(n)=$pBound")
    val pGot = pLabels.collect()
    assert(pGot.length == n && pGot.forall(_.getLong(1) == 0L),
      "path labels wrong: every node must land on component-min 0")
    // 2) large clique — worst case for edge-multiset width (n² pairs,
    //    the shape a degenerate LSH band produces): must collapse in a
    //    couple of rounds and never re-expand past the input edge count.
    val k = 200
    val clique = (for { i <- 0L until k; j <- 0L until i } yield (i, j))
      .toDF("a", "b")
    val (cLabels, cRounds) = Dedup.connectedComponentsWithRounds(clique)
    assert(cRounds <= log2(k) * log2(k), s"clique: $cRounds rounds")
    val cGot = cLabels.collect()
    assert(cGot.length == k && cGot.forall(_.getLong(1) == 0L),
      "clique labels wrong")
  }

  test("transitive near-dedup keeps exactly one survivor per dup-component") {
    // the pair-local shortcut can keep several docs of one component
    // (scaladoc example: edges (1,3),(2,3) keep both 1 and 2); the
    // transitive form must keep exactly the component minimum.
    val docs = graft.lake.Tables.documents(spark, sf)
    val comps = Dedup.connectedComponents(Dedup.nearDupPairs(docs, 0.8))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val survivors = Dedup.dropNearDuplicatesTransitive(docs, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byComp = comps.groupBy(_._2)
    byComp.foreach { case (c, members) =>
      val kept = members.map(_._1).filter(survivors)
      assert(kept.toSeq == Seq(c),
        s"component $c kept ${kept.mkString(",")} — want exactly the minimum")
    }
    // docs in no pair are untouched
    val inPairs = comps.map(_._1).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((all -- inPairs).forall(survivors))
    // and the transitive form is at least as aggressive as the shortcut
    assert(survivors.size <= Dedup.dropNearDuplicates(docs, 0.8).count())
  }

  test("quality-survivor transitive dedup keeps the longest member per component, ties to min id") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val comps = Dedup.connectedComponents(Dedup.nearDupPairs(docs, 0.8))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val len = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val survivors = Dedup
      .dropNearDuplicatesTransitiveBy(docs,
        org.apache.spark.sql.functions.col("n_chars"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    comps.groupBy(_._2).foreach { case (c, members) =>
      val ids = members.map(_._1)
      val want = ids.minBy(id => (-len(id), id))
      val kept = ids.filter(survivors)
      assert(kept.toSeq == Seq(want),
        s"component $c kept ${kept.mkString(",")} — want argmax n_chars $want")
    }
    // docs in no pair are untouched, and the cluster count (one
    // survivor per component) matches the min-id form exactly
    val inPairs = comps.map(_._1).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((all -- inPairs).forall(survivors))
    assert(survivors.size ==
      Dedup.dropNearDuplicatesTransitive(docs, 0.8).count())
  }

  test("span dedup drops exactly the over-frequent chunks and preserves clean docs verbatim") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val out = Dedup.dropBoilerplateSpans(docs, span = 10, maxFreq = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // reference computation in plain Scala
    def chunksOf(t: String) = t.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
    val freq = texts.values.toSeq.flatMap(chunksOf)
      .groupBy(identity).view.mapValues(_.size)
    texts.foreach { case (id, t) =>
      val cs = chunksOf(t)
      val keep = cs.filter(freq(_) <= 2)
      val (nSpans, nDropped, clean) = out(id)
      assert(nSpans == cs.length && nDropped == cs.length - keep.length,
        s"doc $id span counts")
      assert(clean == keep.mkString(" "), s"doc $id rebuilt text")
      if (nDropped == 0) assert(clean == t, s"clean doc $id must pass through verbatim")
    }
    assert(out.values.exists(_._2 > 0), "testdata contains no boilerplate — test is vacuous")
    // the flagging join must broadcast the (tiny) boilerplate set, not
    // shuffle the corpus against it — and the scale escape hatch
    // (broadcastBoilerplate = false) must agree row-for-row
    val plan = Dedup.d7SpanDedup(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate flagging is not a broadcast join:\n$plan")
    val shuffled = Dedup.dropBoilerplateSpans(docs, span = 10, maxFreq = 2,
        broadcastBoilerplate = false)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(shuffled == out, "shuffle-join form disagrees with broadcast form")
  }

  test("global substring dedup keeps EXACTLY one copy of every duplicated chunk (d9 vs plain Scala)") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val out = Dedup.dropDuplicateSpansGlobal(docs, span = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(t: String) = t.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
    // reference survivor election: global min (doc_id, position) per chunk
    val survivor = texts.toSeq
      .flatMap { case (id, t) => chunksOf(t).zipWithIndex.map {
        case (c, i) => (c, (id, i)) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val allKept = scala.collection.mutable.ArrayBuffer.empty[String]
    texts.foreach { case (id, t) =>
      val cs = chunksOf(t)
      val keep = cs.zipWithIndex.collect {
        case (c, i) if survivor(c) == ((id, i)) => c }
      allKept ++= keep
      val (nSpans, nDropped, clean) = out(id)
      assert(nSpans == cs.length && nDropped == cs.length - keep.length,
        s"doc $id span counts")
      assert(clean == keep.mkString(" "), s"doc $id rebuilt text")
    }
    assert(out.values.exists(_._2 > 0),
      "testdata contains no cross-doc duplicate chunk — test is vacuous")
    // corpus-wide: every distinct chunk survives exactly once — d9 loses
    // REPETITION, never content (d7 by contrast deletes boilerplate)
    assert(allKept.distinct.size == allKept.size,
      "a chunk survived more than once")
    assert(allKept.toSet == texts.values.toSeq.flatMap(chunksOf).toSet,
      "some chunk content was lost entirely")
  }

  test("MMR diversification: λ=1 is plain top-k; lower λ strictly diversifies; deterministic") {
    import graft.sim.Similarity
    import org.apache.spark.sql.functions.col
    val k = 5
    // λ=1 degenerates to relevance top-k OVER THE SAME CANDIDATE SET —
    // candidates now come from the LSH index (r6 verdict #2), so the
    // reference ranking is lshTopK, not the brute s1 scan
    val lam1 = Similarity.mmrDiversify(spark, sf, k = k, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val topk = Similarity.lshTopK(spark, sf, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(lam1.toSeq == topk.toSeq, "λ=1 must reproduce pure top-k")
    // λ=0.5: per query the FIRST pick is still the relevance argmax,
    // k rows come back, and the selected set differs from pure top-k
    // somewhere (the whole point of MMR)
    val mmr = Similarity.mmrDiversify(spark, sf, k = k, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byQ = mmr.groupBy(_._1)
    val topByQ = topk.groupBy(_._1)
    assert(byQ.keySet == topByQ.keySet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == k, s"query $q returned ${rows.length} rows")
      assert(rows.minBy(_._3)._2 == topByQ(q).minBy(_._3)._2,
        s"query $q first MMR pick must be the relevance argmax")
    }
    assert(byQ.exists { case (q, rows) =>
      rows.map(_._2).toSet != topByQ(q).map(_._2).toSet
    }, "λ=0.5 never diverged from top-k — diversification is vacuous")
    // determinism across evaluation runs (greedy ties broken by order)
    val again = Similarity.mmrDiversify(spark, sf, k = k, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(again.toSeq == mmr.toSeq)
  }

  test("index-backed hard negatives: no corpus crossJoin, recall vs the brute scan clears the floor") {
    import graft.sim.Similarity
    // the shipped s10 must not contain a corpus-wide cartesian — that
    // shape is retired to s10BruteForce, which stays only as this
    // test's recall oracle (r6 verdict #2 / "What's wrong" #1)
    val idx = Similarity.s10HardNegatives(spark, sf)
    val got = idx.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val plan = idx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"s10 plan still contains a corpus cross join:\n$plan")
    val mmrPlan = Similarity.mmrDiversify(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!mmrPlan.contains("CartesianProduct") &&
      !mmrPlan.contains("BroadcastNestedLoopJoin"),
      s"MMR plan still contains a corpus cross join:\n$mmrPlan")
    val want = Similarity.s10BruteForce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got intersect want).size.toDouble / want.size
    assert(recall >= 0.6,
      f"index-fetch recall $recall%.2f vs brute top-3 below floor 0.6")
  }

  test("crossContamination counts exactly the distinct shared n-grams (plain-Scala reference)") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] =
      t.split(" ", -1).sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val evalGrams = texts.collect { case (id, t) if id % 2 == 1 => grams(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val want = texts.collect {
      case (id, t) if id % 2 == 0 && (grams(t) & evalGrams).nonEmpty =>
        id -> (grams(t) & evalGrams).size.toLong
    }.toMap
    val got = Dedup.d8Contamination(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.nonEmpty, "no cross-parity contamination planted — test is vacuous")
    // the eval gram set must broadcast; the train side must never shuffle by gram
    val plan = Dedup.d8Contamination(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams not broadcast:\n$plan")
  }

  test("s1 brute-force baseline returns a full top-5 per query vector") {
    val rows = Similarity.s1CosineTopk(spark, sf).collect()
    val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQuery.values.forall(_ == 5))
    // ranks are 1..5 and cosine is non-increasing within a query
    perQuery.keys.foreach { q =>
      val rs = rows.filter(_.getLong(0) == q).sortBy(_.getInt(3))
      assert(rs.map(_.getInt(3)).sameElements(1 to 5))
      val cs = rs.map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH bit-width grows with corpus size: one bit per doubling past the calibration point") {
    // boundary values pinned against the DuckDB oracle twin
    // (LEAST(20, 4 + CASE WHEN n//2000 <= 1 THEN 0 ELSE length(bin(n//2000))-1 END))
    // — verified identical in duckdb for every row here
    val expected = Seq(
      0L -> 4, 500L -> 4, 2000L -> 4, 3999L -> 4, // testdata tiers: unchanged
      4000L -> 5, 7999L -> 5, 8000L -> 6,
      20000L -> 7, // the 10x scale tier: 128 buckets/table, occupancy ~ sf0.1's
      2000L * (1L << 16) -> 20, 2000L * (1L << 17) -> 20) // MaxBits cap
    expected.foreach { case (n, bits) =>
      assert(Similarity.bitsFor(n) === bits, s"bitsFor($n)")
    }
  }

  test("ladder smoothing: first extraTablesFor tables carry one extra bit; zero at oracle tiers and exact doublings") {
    // integer twin of the DuckDB params CTE: extra =
    // min(7, (8·(k − 2^⌊log2 k⌋)) // 2^⌊log2 k⌋), 0 at k ≤ 1 or the cap.
    // Cross-engine bucket-set equality at an extra > 0 tier is checked by
    // tools/DumpBuckets + scripts/check_ladder.py (the oracle tiers all
    // sit at extra = 0, so the driver gate alone never exercises it).
    val expected = Seq(
      0L -> 0, 2000L -> 0, 3999L -> 0, // oracle tiers: k <= 1
      4000L -> 0,                      // k = 2, exact doubling
      6000L -> 4,                      // k = 3: (8*(3-2))//2 = 4
      20000L -> 2,                     // the 10x tier: k = 10, (8*2)//8 = 2
      2000L * 15 -> 7,                 // k = 15: (8*7)//8 = 7, at the clamp
      2000L * 16 -> 0,                 // k = 16, exact power of two
      2000L * (1L << 16) -> 0)         // MaxBits cap: smoothing disabled
    expected.foreach { case (n, e) =>
      assert(Similarity.extraTablesFor(n) === e, s"extraTablesFor($n)")
    }
  }

  test("ANN recall@3 vs the exact baseline: LSH and IVF both find real neighbors") {
    def recallAt(dir: String): (Double, Double) = {
      val exact = Similarity.s1CosineTopk(spark, dir).collect()
        .filter(_.getInt(3) <= 3)
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val approx = df.collect().filter(_.getLong(0) < 10)
          .groupBy(_.getLong(0)).view
          .mapValues(_.sortBy(_.getInt(3)).take(3).map(_.getLong(1)).toSet).toMap
        val rs = exact.keys.toSeq.map { q =>
          approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 3.0
        }
        rs.sum / rs.length
      }
      (recall(Similarity.s2AnnLsh(spark, dir)),
        recall(Similarity.s4IvfTopk(spark, dir)))
    }
    // 8 tables x 4 bits gives ~0.8 collision prob on this corpus's best
    // neighbors; nprobe=2 IVF is weaker by construction. Tiny-tier
    // floors sit under the measured values to absorb tier variation
    // without letting a recall collapse (the single-table 8-bit variant
    // measured 0.0) slip through.
    val (lsh, ivf) = recallAt(sf)
    assert(lsh >= 0.4, s"LSH recall@3 collapsed: $lsh")
    assert(ivf >= 0.2, s"IVF recall@3 collapsed: $ivf")
    // sf0.01 recall is deterministic (hash-derived hyperplanes, fixed
    // corpus): pin the measured 0.70 / 0.433 so an LSH/IVF param change
    // can't silently destroy quality (r2 verdict #6).
    val sf001 = "/root/testdata/sf0.01"
    if (new java.io.File(sf001).exists()) {
      val (lsh2, ivf2) = recallAt(sf001)
      assert(lsh2 >= 0.7, s"LSH recall@3 at sf0.01 regressed: $lsh2 (was 0.70)")
      assert(ivf2 >= 0.43, s"IVF recall@3 at sf0.01 regressed: $ivf2 (was 0.433)")
    }
  }

  test("s13 IVF-PQ: recall matches IVF at sf0.01 (ADC fetch recovers the probed lists)") {
    import graft.sim.ProductQuantization
    def recallOf(df: org.apache.spark.sql.DataFrame, dir: String): Double = {
      val exact = Similarity.s1CosineTopk(spark, dir).collect()
        .filter(_.getInt(3) <= 3)
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val approx = df.collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = exact.keys.toSeq.map { q =>
        approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 3.0
      }
      rs.sum / rs.length
    }
    // s13's candidates come from the SAME nprobe=2 lists as s4; with
    // Fetch=40 the ADC pass recovers everything the lists contain on the
    // deterministic sf0.01 corpus (measured: s13 0.433 == s4 0.433; the
    // tiny tier loses one neighbor to ADC approximation, 0.300 vs 0.333).
    assert(recallOf(ProductQuantization.s13IvfPqTopk(spark, sf), sf) >= 0.25,
      "IVF-PQ recall@3 collapsed at tiny tier")
    val sf001 = "/root/testdata/sf0.01"
    if (new java.io.File(sf001).exists()) {
      val r13 = recallOf(ProductQuantization.s13IvfPqTopk(spark, sf001), sf001)
      val r4 = recallOf(Similarity.s4IvfTopk(spark, sf001), sf001)
      assert(r13 >= 0.43, s"IVF-PQ recall@3 at sf0.01 regressed: $r13 (was 0.433)")
      assert(r13 >= r4 - 1e-9,
        s"ADC fetch lost neighbors the probed lists contain: s13 $r13 < s4 $r4")
    }
  }

  test("s9 PQ: codes are in-range, recall@3 holds, and the floor is pinned at sf0.01") {
    import graft.sim.ProductQuantization
    // every code is a valid entry index (argmin never misses)
    val codes = ProductQuantization.encoded(spark, sf).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 16),
        s"pq code out of range: $cs")
    }
    def recallAt(dir: String): Double = {
      val exact = Similarity.s1CosineTopk(spark, dir).collect()
        .filter(_.getInt(3) <= 3)
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val approx = ProductQuantization.s9PqTopk(spark, dir).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = exact.keys.toSeq.map { q =>
        approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 3.0
      }
      rs.sum / rs.length
    }
    // 4 subspaces x 16 entries is a coarse quantizer; fetch=40 re-rank
    // recovers 2/3 of the true top-3 on the deterministic sf0.01 corpus
    // (measured 0.667) — between IVF's 0.433 and LSH's 0.70. Tiny-tier
    // floor below the measured value absorbs tier variation.
    assert(recallAt(sf) >= 0.3, "PQ recall@3 collapsed at tiny tier")
    val sf001 = "/root/testdata/sf0.01"
    if (new java.io.File(sf001).exists())
      assert(recallAt(sf001) >= 0.66,
        "PQ recall@3 at sf0.01 regressed (was 0.667)")
  }

  test("exact dedup keeps the minimum doc_id per content hash") {
    val df = Dedup.d1ExactDedup(spark, sf)
    val n = df.count()
    val docs = graft.lake.Tables.documents(spark, sf).count()
    assert(n <= docs)
    assert(df.selectExpr("min(n_copies)").head.getLong(0) >= 1)
  }

  test("corpus API: dropExactDuplicates keeps one row per content, schema intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"), (4L, "a b c"))
      .toDF("doc_id", "text")
    val out = Dedup.dropExactDuplicates(docs)
    assert(out.columns.sameElements(docs.columns))
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
  }

  test("corpus API: dropNearDuplicates removes the planted near-dups, keeps one survivor") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val pairs = Dedup.nearDupPairs(docs, 0.8).collect()
    val kept = Dedup.dropNearDuplicates(docs, 0.8)
    assert(kept.count() == docs.count() - pairs.map(_.getLong(1)).distinct.length)
    // every surviving pair-member is a doc_a-side (lowest) survivor
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    pairs.foreach { p => assert(!keptIds.contains(p.getLong(1))) }
  }

  test("corpus API: dropEmbeddingNearDuplicates keeps the lowest-id survivor") {
    val all = graft.lake.Tables.embeddings(spark, sf).count()
    val pairs = Similarity.s3EmbeddingNeardup(spark, sf).collect()
    val kept = Similarity.dropEmbeddingNearDuplicates(spark, sf)
    assert(kept.count() == all - pairs.map(_.getLong(1)).distinct.length)
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    pairs.foreach(p => assert(!keptIds.contains(p.getLong(1))))
  }

  test("production hash family (xxhash64) recalls the md5-verified near-dup pairs") {
    val docs = graft.lake.Tables.documents(spark, sf)
    // ground truth: pairs that PASS the exact-Jaccard verify (hash
    // family only affects candidate generation, not the verify measure)
    val verified = Dedup.nearDupPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty)
    val xxVerified = Dedup.nearDupPairs(docs, 0.8,
        fam = graft.functions.Hashing.xxFamily).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // different family -> different random band buckets, but any pair
    // at jaccard >= 0.8 collides in some band w.p. ~0.9; on this corpus
    // both families recall the identical verified set (deterministic).
    assert(xxVerified == verified,
      s"xx family missed ${verified -- xxVerified}, added ${xxVerified -- verified}")
  }

  test("nearDupPairs with a reliable checkpoint matches the localCheckpoint default (r2 verdict #5)") {
    val docs = graft.lake.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val default = Dedup.nearDupPairs(docs, 0.8).collect().map(key).toSet
    val reliable = Dedup.nearDupPairs(docs, 0.8, _.checkpoint())
      .collect().map(key).toSet
    assert(reliable == default)
    // the reliable form actually wrote replicated checkpoint state
    assert(new java.io.File(dir).listFiles().nonEmpty,
      "reliable checkpoint dir is empty — checkpoint() did not materialize")
  }

  test("int8-quantized two-stage search: recall vs the exact baseline, 4x-narrower index") {
    import org.apache.spark.sql.functions.col
    val exact = graft.sim.Similarity.s1CosineTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val quant = graft.sim.Quantization.quantizedTopK(spark, sf, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val recall = exact.keys.toSeq.map { q =>
      (exact(q) & quant.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
    }.sum / exact.size
    // int8 cosine error is sub-1%; with 3x over-fetch the re-rank should
    // recover essentially everything on this corpus
    assert(recall >= 0.9, s"quantized recall@5 = $recall")
    // the stage-1 index really is the 1-byte-per-element form
    val qdf = graft.sim.Quantization.quantizeInt8(
      graft.lake.Tables.embeddings(spark, sf))
    assert(qdf.schema("qvec").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false) ||
      qdf.schema("qvec").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true),
      s"qvec is ${qdf.schema("qvec").dataType}")
    // quantized self-dot of a unit-ish vector lands near 127^2 * dims scaling
    val row = qdf.select(col("qvec"), col("qscale"), col("embedding")).head()
    val qv = row.getSeq[Byte](0).map(_.toDouble)
    val sc = row.getDouble(1)
    val ev = row.getSeq[Float](2).map(_.toDouble)
    val approx = qv.zip(qv).map { case (a, b) => a * b }.sum * sc * sc
    val exactDot = ev.zip(ev).map { case (a, b) => a * b }.sum
    assert(math.abs(approx - exactDot) / exactDot < 0.01,
      s"int8 self-dot off by ${math.abs(approx - exactDot) / exactDot}")
  }

  test("graft_dot accepts array<tinyint> and matches integer math (codegen path)") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // Seq[Byte], not Array[Byte]: the latter encodes as BinaryType
    val df = Seq((Seq[Byte](1, -2, 3), Seq[Byte](4, 5, -6)))
      .toDF("a", "b")
      .selectExpr("graft_dot(a, b) as d")
    assert(df.head().getDouble(0) == (1 * 4 + -2 * 5 + 3 * -6).toDouble)
  }

  test("t10 packing: hand-computed pack assignment at the budget boundary") {
    import spark.implicits._
    // token counts 1000,1500,600,2048,1 with budget 2048:
    // tokens-before = 0,1000,2500,3100,5148 -> packs 0,0,1,1,2
    val dir = java.nio.file.Files.createTempDirectory("pack").toString
    Seq(
      (0L, "en", ("w " * 1000).trim),
      (1L, "en", ("w " * 1500).trim),
      (2L, "en", ("w " * 600).trim),
      (3L, "en", ("w " * 2048).trim),
      (4L, "en", "w"))
      .toDF("doc_id", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.text.TextAnalysis.t10PackDocs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)),
      s"got ${out.toSeq}")
  }

  test("salted join is row-identical to the plain join") {
    val o = graft.lake.Tables.orders(spark, sf)
    val c = graft.lake.Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey")).count()
    val salted = graft.ops.SkewJoin.saltedInner(o, c, "o_custkey", salts = 8)
    assert(salted.count() == plain)
    // no stray helper column in the output
    assert(!salted.columns.contains("__salt"))
  }

  test("saltedLeft is row-identical to the plain left join (matched + null-padded rows)") {
    import org.apache.spark.sql.functions.col
    val o = graft.lake.Tables.orders(spark, sf)
    // dim covering only some keys, so unmatched big rows must null-pad
    val c = graft.lake.Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .filter(col("o_custkey") % 3 === 0)
    val plain = o.join(c, Seq("o_custkey"), "left")
    val salted = graft.ops.SkewJoin.saltedLeft(o, c, "o_custkey", salts = 8)
    assert(salted.count() == plain.count())
    val nullsPlain = plain.filter(col("c_name").isNull).count()
    val nullsSalted = salted.filter(col("c_name").isNull).count()
    assert(nullsPlain > 0 && nullsSalted == nullsPlain,
      s"null-pad mismatch: plain=$nullsPlain salted=$nullsSalted")
    assert(!salted.columns.contains("__salt"))
  }

  test("salting tolerates unhashable (map-typed) columns in the big side (r3 review)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, map}
    val big = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      .withColumn("m", map(col("v"), col("v"))) // hash(map) throws by default
    val small = Seq((1, "x"), (3, "y")).toDF("k", "s")
    val inner = graft.ops.SkewJoin.saltedInner(big, small, "k", salts = 4)
    assert(inner.count() == 2)
    val left = graft.ops.SkewJoin.saltedLeft(big, small, "k", salts = 4)
    assert(left.count() == 3 && left.filter(col("s").isNull).count() == 1)
  }

  test("simhash/minhash signature stages are narrow (no shuffle before the band join)") {
    // one Exchange for the self-join key + one for the final sort is
    // expected; the signature computation itself must not add one.
    val plan = Dedup.d2MinhashLsh(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 6, s"too many exchanges ($exchanges):\n$plan")
  }

  test("s14 radius search: cosines exact, nothing outside the radius, recall vs brute radius pinned") {
    val tau = 0.15
    val got = Similarity.s14RadiusSearch(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.nonEmpty)

    // brute reference: same sequential-fold cosine in plain Scala
    // (same operand order + double widening = the same doubles the
    // graft_dot expression produces)
    val vecs = graft.lake.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      q <- vecs.keys.toSeq if q < 10
      n <- vecs.keys.toSeq if n != q
      c = cos(vecs(q), vecs(n)) if math.rint(c * 10000) / 10000 >= tau
    } yield ((q, n), c)).toMap

    // every reported hit is inside the radius with the exact cosine
    got.foreach { case (pair, c) =>
      assert(c >= tau, s"$pair reported below the radius: $c")
      val exact = brute.getOrElse(pair,
        fail(s"$pair reported but its exact cosine is below the radius"))
      assert(math.abs(c - exact) <= 5e-5, s"$pair cos $c vs exact $exact")
    }
    // deterministic corpus => the index's radius recall is a fixed
    // number; pin a hard floor the way the topk recall floors are
    val recall = got.keySet.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.30,
      f"radius recall $recall%.3f under the pinned floor (|brute| = ${brute.size})")
  }

  test("s15 filtered topk: every hit shares the query's label, ranks dense, cosines exact, and the pre-filter is not a post-filter") {
    val rows = Similarity.s15FilteredTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = graft.lake.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    // filter semantics: the label column is the QUERY's label and every
    // neighbor matches it
    rows.foreach { r =>
      val (q, lab, n) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(lab == labels(q), s"q=$q carries label $lab != ${labels(q)}")
      assert(labels(n) == lab, s"q=$q got n=$n with label ${labels(n)} != $lab")
      assert(n != q)
    }
    // ranks are dense 1..k(q) per query
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(4)).sorted.toSeq
      assert(ranks == (1 to rs.length), s"q=$q ranks $ranks not dense")
    }
    // cosines are the exact values (same fold as the brute reference)
    val vecs = graft.lake.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { r =>
      val exact = cos(vecs(r.getLong(0)), vecs(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - exact) <= 5e-5,
        s"q=${r.getLong(0)} n=${r.getLong(2)} cos ${r.getDouble(3)} vs $exact")
    }
    // pre-filter vs post-filter: discarding off-label rows from the
    // UNFILTERED top-5 must lose results somewhere on this corpus —
    // i.e. some query's filtered top-5 reaches a neighbor the
    // unfiltered top-5 never surfaced (the reason filtered search is
    // an index feature, not a WHERE clause on the result)
    val unfiltered = Similarity.lshTopK(spark, sf, 5).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => (q, rs.map(_.getLong(1)).toSet) }
    val gained = rows.exists { r =>
      !unfiltered.getOrElse(r.getLong(0), Set.empty).contains(r.getLong(2))
    }
    assert(gained,
      "every filtered hit is inside the unfiltered top-5 — post-filtering would have sufficed on this corpus and the spec lost its bite")
  }
}
