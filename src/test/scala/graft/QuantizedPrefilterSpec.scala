package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{Quantization, Similarity}

/** The int8 quantized prefilter under s3's oracle contract (r9): the
  * shipped [[Similarity.s3EmbeddingNeardup]] pre-drops candidate pairs
  * only when a SOUND error bound proves the exact cosine cannot reach
  * the threshold, so its output must be IDENTICAL to the retained
  * all-float [[Similarity.s3EmbeddingNeardupExact]] — not merely
  * high-recall. Three pins:
  *
  *  1. bound soundness: |cos − cos_q| ≤ slack on random AND adversarial
  *     vectors (one-hot spikes maximize relative quantization error;
  *     near-parallel and near-orthogonal pairs bracket the cosine
  *     range; tiny-norm vectors stress the 1/‖a‖‖b‖ amplification)
  *  2. equivalence on the real corpus (sf0.001)
  *  3. equivalence on a seeded corpus PLANTED with pairs straddling the
  *     τ = 0.30 threshold (±0.0002, inside any plausible slack) in
  *     shared LSH buckets — the regime where an UNSOUND prefilter
  *     actually loses pairs and a recall-style test would still pass
  */
class QuantizedPrefilterSpec extends AnyFunSuite {
  import TestSpark._

  private val Dims = 64

  /** cos, cos_q, slack for explicit vector pairs, through the SAME
    * engine expressions the query uses (graft_dot tinyint leg included).
    */
  private def boundRows(pairs: Seq[(Array[Float], Array[Float])])
      : Seq[(Double, Double, Double)] = {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val df = pairs.toDF("va", "vb")
    val q = Quantization.quantizeInt8(
      Quantization.quantizeInt8(df, "va")
        .withColumnRenamed("qscale", "sa").withColumnRenamed("qvec", "qa"),
      "vb")
      .withColumnRenamed("qscale", "sb").withColumnRenamed("qvec", "qb")
      .withColumn("na", expr("sqrt(graft_dot(va, va))"))
      .withColumn("nb", expr("sqrt(graft_dot(vb, vb))"))
    q.select(
        (expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cos"),
        (expr("graft_dot(qa, qb)") * col("sa") * col("sb") /
          (col("na") * col("nb"))).as("cos_q"),
        ((lit(4.0) * (col("sb") * col("na") + col("sa") * col("nb")) +
          lit(48.0) * col("sa") * col("sb")) / (col("na") * col("nb")) +
          lit(1e-9)).as("slack"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
  }

  test("quantization error bound is sound on random and adversarial vectors") {
    val rnd = new scala.util.Random(20260814)
    def gauss(scale: Float): Array[Float] =
      Array.fill(Dims)(rnd.nextGaussian().toFloat * scale)
    def spike(): Array[Float] = {
      // one dominant component: maximal maxAbs/typical-component ratio,
      // the worst case for symmetric int8
      val v = gauss(0.01f); v(rnd.nextInt(Dims)) = 5f; v
    }
    def nearCopy(a: Array[Float]): Array[Float] =
      a.zip(gauss(0.001f)).map { case (x, e) => x + e }
    val pairs =
      Seq.fill(200)((gauss(1f), gauss(1f))) ++           // typical
        Seq.fill(50)((spike(), spike())) ++              // spikes
        Seq.fill(50) { val a = gauss(1f); (a, nearCopy(a)) } ++ // cos ≈ 1
        Seq.fill(50)((gauss(1e-4f), gauss(10f)))         // norm imbalance
    val rows = boundRows(pairs)
    rows.zipWithIndex.foreach { case ((cos, cosQ, slack), i) =>
      assert(math.abs(cos - cosQ) <= slack,
        s"pair $i: |$cos - $cosQ| = ${math.abs(cos - cosQ)} > slack $slack")
    }
    // and the bound is TIGHT enough to be useful: on typical unit-scale
    // vectors the median slack must sit well under the 0.30 threshold
    val typical = rows.take(200).map(_._3).sorted
    assert(typical(100) < 0.08,
      s"median slack ${typical(100)} — prefilter would keep everything")
  }

  test("quantized-prefilter s3 == all-float s3 on the real corpus") {
    val fast = Similarity.s3EmbeddingNeardup(spark, sf)
      .collect().map(_.toString).sorted
    val exact = Similarity.s3EmbeddingNeardupExact(spark, sf)
      .collect().map(_.toString).sorted
    assert(fast.nonEmpty || exact.isEmpty)
    assert(fast.toSeq == exact.toSeq,
      s"quantized prefilter changed s3's output (${fast.size} vs ${exact.size} rows)")
  }

  /** Seeded corpus with pairs planted at cosine 0.30 ± 2e-4 (inside any
    * plausible slack) plus random background — the regime where an
    * unsound prefilter actually loses pairs.
    */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def gauss(): Array[Double] = Array.fill(Dims)(rnd.nextGaussian())
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // pairs at cosine τ + δ for δ straddling 0: construct b = c·a + s·g⊥
    val planted = Seq(-2e-4, -1e-4, 0.0, 1e-4, 2e-4).zipWithIndex.flatMap {
      case (delta, i) =>
        val target = 0.30 + delta
        val a = unit(gauss())
        val g = gauss()
        val dotAg = a.zip(g).map { case (x, y) => x * y }.sum
        val perp = unit(g.zip(a).map { case (y, x) => y - dotAg * x })
        val b = a.zip(perp).map { case (x, p) =>
          target * x + math.sqrt(1 - target * target) * p }
        Seq((2000L + 2 * i, a), (2001L + 2 * i, b))
    }
    val background = (0 until 100).map(i => (3000L + i, unit(gauss())))
    val rows = (planted ++ background).map { case (id, v) =>
      (id, v.map(_.toFloat)) }
    val dir = java.nio.file.Files.createTempDirectory("graft_qpf").toString
    rows.toDF("vec_id", "embedding").withColumn("label", lit("x"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("equivalence holds on planted near-threshold pairs") {
    val fast = Similarity.s3EmbeddingNeardup(spark, plantedDir)
      .collect().map(_.toString).sorted
    val exact = Similarity.s3EmbeddingNeardupExact(spark, plantedDir)
      .collect().map(_.toString).sorted
    assert(fast.toSeq == exact.toSeq,
      s"planted corpus: ${fast.size} vs ${exact.size} rows differ")
    // the plant worked: at least one pair actually sits at/above τ
    assert(exact.nonEmpty, "no planted pair survived — fixture regression")
  }

  test("fused score-in-join s2 == joined+window s2 (real + planted corpora)") {
    // r9 restructure: the shipped s2 scores inside the bucket self-join
    // and dedups multi-table duplicate collisions INSIDE the distinct-
    // top-k partial aggregation; the r8 joined form dedups with a
    // pair-grain exchange then window-ranks. Equal output is the whole
    // contract (same fold, same tie-break, duplicates bit-identical).
    Seq(sf, plantedDir).foreach { dir =>
      val fused = Similarity.s2AnnLsh(spark, dir)
        .collect().map(_.toString).sorted
      val joined = Similarity.s2AnnLshJoined(spark, dir)
        .collect().map(_.toString).sorted
      assert(fused.nonEmpty, s"$dir: fused s2 returned 0 rows")
      assert(fused.toSeq == joined.toSeq,
        s"$dir: fused s2 diverges from joined form " +
          s"(${fused.size} vs ${joined.size} rows)")
    }
  }

  test("fused s3 == joined-prefilter s3 (real + planted corpora)") {
    Seq(sf, plantedDir).foreach { dir =>
      val fused = Similarity.s3EmbeddingNeardup(spark, dir)
        .collect().map(_.toString).sorted
      val joined = Similarity.s3EmbeddingNeardupJoined(spark, dir)
        .collect().map(_.toString).sorted
      assert(fused.toSeq == joined.toSeq,
        s"$dir: fused s3 diverges from joined-prefilter form " +
          s"(${fused.size} vs ${joined.size} rows)")
    }
  }

  test("pruned s2 variant top-3 == shipped s2 top-3 (real + planted corpora)") {
    // the pruned form is the ADJUDICATED variant (slower in exchanges,
    // SCALE10TO100_S2Q.json), retained with its losslessness proof live
    Seq(sf, plantedDir).foreach { dir =>
      val pruned = Similarity.rankTop3(Similarity.s2ScoredPruned(spark, dir))
        .collect().map(_.toString).sorted
      val full = Similarity.s2AnnLsh(spark, dir) // shipped: unpruned
        .collect().map(_.toString).sorted
      assert(pruned.nonEmpty, s"$dir: s2 returned 0 rows")
      assert(pruned.toSeq == full.toSeq,
        s"$dir: quantized pruning changed s2's top-3 " +
          s"(${pruned.size} vs ${full.size} rows)")
    }
  }
}
