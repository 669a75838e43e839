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
}
