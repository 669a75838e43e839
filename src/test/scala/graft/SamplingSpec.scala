package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic sampling: stability (the whole point), rate accuracy,
  * salt independence, per-stratum rates.
  */
class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = graft.lake.Tables.documents(spark, sf)
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("the selected set is identical under any partition layout (what rand() sampling is not)") {
    val a = ids(Sampling.deterministic(docs.repartition(1), col("doc_id"), 0.5))
    val b = ids(Sampling.deterministic(docs.repartition(7, col("lang")), col("doc_id"), 0.5))
    val c = ids(Sampling.deterministic(docs, col("doc_id"), 0.5))
    assert(a == b && b == c && a.nonEmpty)
  }

  test("realized rate tracks the requested rate") {
    val n = docs.count().toDouble
    val kept = ids(Sampling.deterministic(docs, col("doc_id"), 0.5)).size
    assert(math.abs(kept / n - 0.5) < 0.1,
      s"rate 0.5 realized ${kept / n} over ${n.toInt} docs")
  }

  test("different salts draw near-independent samples") {
    val a = ids(Sampling.deterministic(docs, col("doc_id"), 0.5, salt = "a"))
    val b = ids(Sampling.deterministic(docs, col("doc_id"), 0.5, salt = "b"))
    assert(a != b)
    val overlap = (a & b).size.toDouble / docs.count()
    assert(math.abs(overlap - 0.25) < 0.1, // P(both) = rate^2 if independent
      s"salted samples overlap $overlap, expected ~0.25")
  }

  test("stratified honors per-stratum rates") {
    val out = Sampling.stratified(docs, col("lang"), col("doc_id"),
      rates = Map("en" -> 0.25), defaultRate = 0.8, salt = "s1")
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept("en").toDouble / total("en")
    assert(math.abs(enRate - 0.25) < 0.15, s"en realized $enRate, wanted ~0.25")
    val restKept = (kept - "en").values.sum.toDouble
    val restTotal = (total - "en").values.sum.toDouble
    assert(math.abs(restKept / restTotal - 0.8) < 0.15,
      s"non-en realized ${restKept / restTotal}, wanted ~0.8")
  }

  test("weight-budget sample: kept weight tracks the budget; over-budget keeps all; deterministic") {
    val weighted = docs.withColumn("w", size(split(col("text"), " ")))
    val total = weighted.agg(sum("w")).head().getLong(0)
    val budget = total / 2
    def run() = Sampling.toWeightBudget(weighted, col("doc_id"), col("w"), budget)
    val kept = run().agg(sum("w")).head().getLong(0)
    // ~50 docs at sf0.001 → coin deviation O(1/sqrt(50)); generous band
    assert(math.abs(kept - budget).toDouble / budget < 0.4,
      s"kept weight $kept vs budget $budget over total $total")
    assert(ids(run()) == ids(run()), "re-run drew a different sample")
    // budget >= total keeps the whole corpus; 0 keeps nothing
    assert(Sampling.toWeightBudget(weighted, col("doc_id"), col("w"), total * 2)
      .count() == docs.count())
    assert(Sampling.toWeightBudget(weighted, col("doc_id"), col("w"), 0L).count() == 0)
  }

  test("rate 0 keeps nothing, rate 1 keeps everything") {
    assert(Sampling.deterministic(docs, col("doc_id"), 0.0).isEmpty)
    assert(Sampling.deterministic(docs, col("doc_id"), 1.0).count() == docs.count())
  }

  test("temperature mix flattens the head/tail ratio toward sqrt") {
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val head = total.maxBy(_._2)._1
    val tail = total.minBy(_._2)._1
    val kept = Sampling.temperatureMix(docs, col("lang"), col("doc_id"),
        targetRows = total.values.sum / 2, salt = "tm")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // τ=0.5: expected kept ratio head/tail = sqrt(n_head/n_tail) — i.e.
    // the tail's KEEP RATE exceeds the head's
    val headRate = kept(head).toDouble / total(head)
    val tailRate = kept.getOrElse(tail, 0L).toDouble / total(tail)
    assert(tailRate > headRate,
      s"tail $tail rate $tailRate should beat head $head rate $headRate")
    // expected total ~ targetRows (coin concentration; generous band
    // for the ~50-docs-per-group corpus)
    val target = total.values.sum / 2
    assert(math.abs(kept.values.sum.toDouble - target) / target < 0.5)
  }

  test("temperature mix: tau=1 is proportional; huge target caps at keep-all") {
    // τ=1 ⇒ every group's threshold is the same flat rate
    val t1 = Sampling.temperatureMix(docs, col("lang"), col("doc_id"),
      targetRows = docs.count() / 2, tau = 1.0, salt = "tm")
    val flat = Sampling.deterministic(docs, col("doc_id"), 0.5, salt = "tm")
    // both are the same coin with (up to floor quantization) the same
    // threshold, so the selections coincide almost exactly
    val d = t1.select("doc_id").exceptAll(flat.select("doc_id")).count() +
      flat.select("doc_id").exceptAll(t1.select("doc_id")).count()
    assert(d <= docs.count() / 20, s"tau=1 diverged from flat rate by $d docs")
    // target beyond the corpus: every threshold caps at 1 ⇒ keep all
    assert(Sampling.temperatureMix(docs, col("lang"), col("doc_id"),
      targetRows = docs.count() * 10).count() == docs.count())
  }

  test("temperature mix is stable under repartitioning") {
    def run(parts: Int) = ids(Sampling.temperatureMix(
      docs.repartition(parts), col("lang"), col("doc_id"),
      targetRows = 30, salt = "tm"))
    assert(run(2) == run(13))
  }
}
