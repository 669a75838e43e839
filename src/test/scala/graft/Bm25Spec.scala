package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bm25

/** BM25 (t27): ranking semantics the hash-compare can't see, plus the
  * top-k plan shape.
  */
class Bm25Spec extends AnyFunSuite {
  import TestSpark._

  test("rank list is dense 1..k, doc_ids unique, and deterministic across repartition") {
    val r = Bm25.t27Bm25(spark, sf).collect()
    assert(r.map(_.getInt(0)).toSeq == (1 to r.length))
    assert(r.map(_.getLong(1)).distinct.length == r.length)
    val again = Bm25.t27Bm25(spark, sf).collect()
    assert(r.toSeq == again.toSeq)
  }

  test("idf dominates: a doc containing only the rare term outranks docs with only stopword-grade terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare filler filler filler"),
      (2L, "common common filler filler"),
      (3L, "common filler pad pad"),
      (4L, "common pad pad filler"),
      (5L, "common filler filler pad"),
      (6L, "pad pad pad pad")
    ).toDF("doc_id", "text")
    val top = Bm25.rank(docs, Seq("rare", "common"), k = 10).collect()
    // df(rare)=1 of 6, df(common)=4 of 6 -> idf(rare) >> idf(common);
    // equal dl everywhere, tf comparable -> doc 1 must lead
    assert(top.head.getLong(1) == 1L, s"expected doc 1 first, got ${top.toSeq}")
    // doc 6 matches nothing -> absent
    assert(!top.map(_.getLong(1)).contains(6L))
    // matched counts: doc 1 matched 1 term
    assert(top.head.getInt(2) == 1)
  }

  test("tf saturation: more occurrences never hurt, but k1 bounds the gain") {
    import spark.implicits._
    // identical dl; tf of the single query term varies 1/2/8
    val docs = Seq(
      (1L, "q f f f f f f f"),
      (2L, "q q f f f f f f"),
      (3L, "q q q q q q q q")
    ).toDF("doc_id", "text")
    val ranked = Bm25.rank(docs, Seq("q"), k = 3).collect().map(_.getLong(1))
    assert(ranked.toSeq == Seq(3L, 2L, 1L), s"got ${ranked.toSeq}")
  }

  test("top-k plans as TakeOrderedAndProject — never a global corpus sort") {
    val top = Bm25.t27Bm25(spark, sf)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
