package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.FreqSketchAggregator

/** Misra-Gries sketch: the error/superset guarantee (local, simulating
  * the distributed reduce/merge tree) and the two-pass t8 query's
  * exactness against a plain heavy-hitter computation.
  */
class FreqSketchSpec extends AnyFunSuite {
  import TestSpark._

  test("MG guarantee: <=k counters, undercount <= n/(k+1), superset of frequent items") {
    val rnd = new scala.util.Random(42)
    // long tail + planted heavy hitters above the n/(k+1) threshold
    val stream = rnd.shuffle(
      Seq.fill(17900)(s"t${rnd.nextInt(rnd.nextInt(500) + 1)}") ++
        Seq.fill(1500)("hot") ++ Seq.fill(600)("warm"))
    val k = 50
    val agg = new FreqSketchAggregator(k)
    // simulate 8 map tasks + a merge tree
    val bufs = stream.grouped(2500)
      .map(slice => slice.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = bufs.reduce(agg.merge)
    assert(merged.size <= k, s"buffer exceeded k: ${merged.size}")

    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = stream.size.toLong
    val bound = n / (k + 1) + 1 // ceil of the real-valued n/(k+1)
    merged.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: est=$est exact=${exact(t)}")
      assert(exact(t) - est <= bound,
        s"$t undercounted past the bound: est=$est exact=${exact(t)} bound=$bound")
    }
    val mustHave = exact.collect { case (t, c) if c > bound => t }.toSet
    assert(mustHave.nonEmpty && mustHave.subsetOf(agg.finish(merged).toSet),
      s"frequent items missing from candidates: ${mustHave -- agg.finish(merged).toSet}")
  }

  test("t8 two-pass sketch+recount equals the exact heavy-hitter query") {
    val out = graft.text.TextAnalysis.t8FrequentTokens(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val tok = graft.lake.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = tok.count()
    val exact = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= (n + 499) / 500)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty, "no frequent tokens found at all")
    assert(out.toSet == exact.toSet,
      s"two-pass != exact: only-sketch=${out.toSet -- exact.toSet} only-exact=${exact.toSet -- out.toSet}")
  }
}
