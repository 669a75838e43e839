package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.tools.ScaleUp

/** The tier generator's non-aliasing contract (r15 verdict #1): the
  * caesar rotation aliased mod 26 — copies ≥ 26 were exact text
  * clones, saturating planted dup density 10% → 100% between the 10×
  * and 100× tiers and confounding every text-family scale law at
  * ≥ 26×. The permutation/sign-flip replacements are pinned here:
  * per-copy maps are bijective and copy-distinct, dup density is
  * TIER-INVARIANT at a factor past the old alias period, and the
  * embedding transform preserves norms while never cloning a vector.
  */
class ScaleUpSpec extends AnyFunSuite {
  import TestSpark._

  private val Lower = "abcdefghijklmnopqrstuvwxyz"

  test("permAlpha: identity at copy 0, bijective and pairwise-distinct through 200 copies") {
    val (f0, t0) = ScaleUp.permAlpha(0)
    assert(f0 == t0)
    val maps = (1 to 200).map { c =>
      val (from, to) = ScaleUp.permAlpha(c)
      assert(from == Lower + Lower.toUpperCase)
      val lo = to.take(26)
      assert(lo.sorted == Lower, s"copy $c is not a permutation of a-z")
      assert(to.drop(26) == lo.toUpperCase)
      lo
    }
    assert(maps.distinct.size == 200, "two copies drew the same permutation")
    // the old rotation's failure mode: copy 26 ≡ copy 0
    assert(maps(25) != Lower, "copy 26 aliased back to the identity")
  }

  test("flipBits: zero at copy 0, distinct masks through 200 copies") {
    assert(ScaleUp.flipBits(0) == 0L)
    val masks = (1 to 200).map(ScaleUp.flipBits)
    assert(masks.distinct.size == 200)
  }

  test("documents: planted dup density is tier-invariant past the old alias period") {
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text")
    val n = src.count()
    def dupStats(docs: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val occ = graft.text.SubstringDedup.occurrencesOf(docs)
        .localCheckpoint()
      val dup = occ.groupBy("ngh").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select("ngh")
      (occ.join(dup, "ngh").count(), occ.count())
    }
    val (dup1, tot1) = dupStats(src)
    // factor 30 > 26: the rotation generator made copies 26+ exact
    // clones of copies 0+, so EVERY span in those copies was
    // duplicated and density jumped toward 100%
    val factor = 30
    val (dupF, totF) = dupStats(ScaleUp.scaledDocuments(src, factor, n))
    assert(totF == factor * tot1, "copies must preserve token counts exactly")
    val d1 = dup1.toDouble / tot1
    val dF = dupF.toDouble / totF
    assert(math.abs(dF - d1) < 0.01 * math.max(d1, 1e-9),
      f"dup density drifted across tiers: base $d1%.4f vs ${factor}x $dF%.4f")
  }

  test("embeddings: norms preserved bit-for-bit, no cross-copy clones past the old shift period") {
    val src = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 100).localCheckpoint()
    val n = 100L
    // factor 70 > 64: the shift-only generator made copies 64+ exact
    // embedding clones of copies 0+
    val factor = 70
    val scaled = ScaleUp.scaledEmbeddings(src, factor, n).localCheckpoint()
    assert(scaled.count() == factor * n)
    // per-copy norm multiset ≈ the source's norm multiset: the VALUES
    // are preserved exactly (shift permutes, flip negates), but the
    // sequential float sum visits them in shifted order, so the
    // comparison is toleranced, not bit-for-bit
    val norm = aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2")
    val srcNorms = src.select(norm).collect().map(_.getDouble(0)).sorted.toSeq
    val perCopy = scaled
      .select((col("vec_id") / n).cast("long").as("copy"), norm)
      .collect().groupBy(_.getLong(0))
      .map { case (c, rs) => c -> rs.map(_.getDouble(1)).sorted.toSeq }
    assert(perCopy.size == factor)
    perCopy.foreach { case (c, norms) =>
      norms.zip(srcNorms).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
          s"copy $c changed a norm: $a vs $b")
      }
    }
    // no two rows in the scaled tier share an embedding array
    val clones = scaled.groupBy("embedding").count()
      .filter(col("count") >= 2).count()
    assert(clones == 0L, "scaled tier contains exact embedding clones")
  }
}
