package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Hybrid

/** s8 hybrid RRF: structural invariants the oracle hash can't express —
  * fusion actually draws from BOTH modalities, and a doc ranked high by
  * both beats one ranked high by only one.
  */
class HybridSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val out = Hybrid.s8HybridRrf(spark, sf).cache()

  test("every query gets a full top-5 with distinct neighbors") {
    val perQ = out.groupBy("q_id").count().collect()
    assert(perQ.length == 10)
    assert(perQ.forall(_.getLong(1) == 5))
    assert(out.select("q_id", "n_id").distinct().count() == 50)
  }

  test("rrf scores are within the achievable range and ranks ordered") {
    // max possible: rank 1 in both lists = 2/61; min admitted: rank-20
    // in one list only = 1/80
    val fp = out.select("rrf_fp").collect().map(_.getLong(0))
    assert(fp.forall(v => v >= (1e8 / 80).toLong && v <= (2e8 / 61).toLong + 1))
    val mono = out.orderBy("q_id", "rank")
      .groupBy("q_id").agg(collect_list("rrf_fp").as("s")).collect()
      .forall(r => { val s = r.getSeq[Long](1); s == s.sorted.reverse })
    assert(mono, "rrf_fp must be non-increasing with rank within a query")
  }

  test("a doc present in both modality lists outranks single-modality docs at equal depth") {
    // any doc with rrf_fp > 1/61 (the best single-list score) must have
    // appeared in both lists; ensure at least one such doc exists
    // corpus-wide (the fusion is actually fusing), and that it sits at
    // rank 1 for its query
    val dual = out.filter(col("rrf_fp") > (1e8 / 61).toLong)
    assert(dual.count() > 0, "no doc was ranked by both modalities")
    val notTop = dual.filter(col("rank") =!= 1)
      .join(out.filter(col("rank") === 1)
          .select(col("q_id"), col("rrf_fp").as("top_fp")), "q_id")
      .filter(col("rrf_fp") > col("top_fp")).count()
    assert(notTop == 0)
  }
}
