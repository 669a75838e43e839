package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DistinctTopKAggregator

/** [[DistinctTopKAggregator]] is load-bearing in the shipped s2 (r9
  * score-in-join restructure): its partial buffers dedup the
  * multi-table duplicate collisions that `dropDuplicates` used to
  * absorb with a pair-grain exchange. These properties pin the
  * aggregator against the reference semantics — sorted distinct
  * take-k — across random insert orders, duplicate densities, and
  * arbitrary partial/merge splits (the shapes Spark's partial
  * aggregation actually produces).
  */
class DistinctTopKSpec extends AnyFunSuite {

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.distinct.sortBy { case (s, id) => (-s, id) }.take(k)

  private def runSplit(agg: DistinctTopKAggregator,
      xs: Seq[(Double, Long)], splits: Seq[Int]): Seq[(Double, Long)] = {
    // cut xs at the given positions, reduce each slice independently,
    // then merge left to right — the partial-aggregation execution shape
    val parts = (0 +: splits :+ xs.length).distinct.sorted
      .sliding(2).collect { case Seq(a, b) if b > a => xs.slice(a, b) }.toSeq
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
  }

  test("random streams with heavy duplication match sorted-distinct-take-k") {
    val rnd = new scala.util.Random(9091)
    (1 to 200).foreach { trial =>
      val k = 1 + rnd.nextInt(5)
      val agg = new DistinctTopKAggregator(k)
      val distinctPool = Seq.fill(1 + rnd.nextInt(12))(
        (math.rint(rnd.nextDouble() * 10) / 10, rnd.nextInt(6).toLong))
        .distinct
      // each logical tuple appears 1–8 times (the ≤8-table collision
      // profile), in a shuffled global order
      val stream = rnd.shuffle(
        distinctPool.flatMap(t => Seq.fill(1 + rnd.nextInt(8))(t)))
      val splits = Seq.fill(rnd.nextInt(4))(rnd.nextInt(stream.length + 1))
      val got = runSplit(agg, stream, splits)
      assert(got == reference(stream, k),
        s"trial $trial: k=$k stream=$stream splits=$splits got=$got")
    }
  }

  test("a duplicate of an in-buffer tuple cannot evict the k-th entry") {
    val agg = new DistinctTopKAggregator(3)
    // A > B > C; duplicate of A arrives after the buffer is full
    val a = (0.9, 1L); val b = (0.8, 2L); val c = (0.7, 3L)
    val buf = Seq(a, b, c).foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(buf, a) == Seq(a, b, c),
      "duplicate insert must not displace the 3rd distinct entry")
  }

  test("a duplicate of an evicted tuple stays evicted") {
    val agg = new DistinctTopKAggregator(2)
    val stream = Seq((0.5, 9L), (0.8, 1L), (0.9, 2L), (0.5, 9L))
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq((0.9, 2L), (0.8, 1L)))
  }

  test("equal scores break ties by id ascending, matching the window form") {
    val agg = new DistinctTopKAggregator(2)
    val stream = Seq((0.5, 3L), (0.5, 1L), (0.5, 2L))
    assert(stream.foldLeft(agg.zero)(agg.reduce) == Seq((0.5, 1L), (0.5, 2L)))
  }
}
