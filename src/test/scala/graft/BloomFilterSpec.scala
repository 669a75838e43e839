package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BloomAggregator, BloomKernel, BloomMightContain}
import graft.ops.BloomJoin

/** Runtime Bloom-filter join pruning: the no-false-negative guarantee
  * (what makes j8 oracle-checkable against the plain join), a
  * false-positive-rate sanity bound, codegen parity, and the plan
  * shape (probe sits in the scan stage before the exchange).
  */
class BloomFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def build(keys: Seq[Long], fpp: Double = 0.01): Array[Byte] = {
    val (m, k) = BloomKernel.sizeFor(math.max(1, keys.length.toLong), fpp)
    val words = new Array[Long](m / 64)
    keys.foreach(BloomKernel.add(words, _, k))
    BloomKernel.serialize(k, words)
  }

  test("no false negatives: every inserted key probes true (deterministic keys incl. extremes)") {
    val keys = (0L until 2000L).map(i => i * 2654435761L) ++
      Seq(Long.MinValue, Long.MaxValue, 0L, -1L)
    val bloom = build(keys)
    keys.foreach { key =>
      assert(BloomKernel.contains(bloom, key), s"false negative for $key")
    }
  }

  test("false positive rate at fpp=0.01 stays under 3% on a disjoint probe set") {
    val inserted = (0L until 1000L).map(i => i * 2654435761L)
    val bloom = build(inserted, 0.01)
    val probes = (1L to 20000L).map(i => i * 6364136223846793005L + 7L)
      .filterNot(inserted.toSet)
    val fp = probes.count(BloomKernel.contains(bloom, _))
    val rate = fp.toDouble / probes.length
    assert(rate < 0.03, s"fp rate $rate (${fp}/${probes.length})")
  }

  test("sizeFor: power-of-two bits, sane k, grows with n and shrinks with fpp") {
    val (m1, k1) = BloomKernel.sizeFor(300, 0.01)
    assert((m1 & (m1 - 1)) == 0 && m1 >= 64)
    assert(k1 >= 1 && k1 <= 16)
    val (m2, _) = BloomKernel.sizeFor(30000, 0.01)
    assert(m2 > m1)
    val (m3, _) = BloomKernel.sizeFor(300, 0.0001)
    assert(m3 >= m1)
  }

  test("aggregator merge (bitwise OR) equals single-pass build; split across partitions") {
    val keys = (0L until 500L).map(i => i * 40503L + 11L)
    val single = build(keys)
    import spark.implicits._
    val (m, k) = BloomKernel.sizeFor(500, 0.01)
    val distributed = keys.toDS().repartition(7)
      .select(new BloomAggregator(m, k).toColumn).head()
    assert(java.util.Arrays.equals(single, distributed))
  }

  test("codegen parity: generated projection equals interpreted eval; null in either arg -> null") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val bloom = build(Seq(1L, 2L, 3L))
    val samples = Seq(1L, 2L, 3L, 4L, 99L, Long.MinValue)
    samples.foreach { key =>
      val e = BloomMightContain(
        Literal.create(bloom, BinaryType), Literal.create(key, LongType))
      val proj = GenerateMutableProjection.generate(Seq(e))
      assert(proj(InternalRow.empty).getBoolean(0) ==
        BloomKernel.contains(bloom, key), s"key $key")
    }
    val nulls = Seq(
      BloomMightContain(Literal.create(null, BinaryType),
        Literal.create(1L, LongType)),
      BloomMightContain(Literal.create(bloom, BinaryType),
        Literal.create(null, LongType)))
    nulls.foreach { e =>
      val proj = GenerateMutableProjection.generate(Seq(e))
      assert(proj(InternalRow.empty).isNullAt(0))
    }
  }

  test("j8 equals the plain join exactly, and the probe sheds fact rows before it") {
    val plain = graft.lake.Tables.orders(spark, sf)
      .join(graft.lake.Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderpriority")
    val viaBloom = BloomJoin.j8BloomJoin(spark, sf)
    assert(viaBloom.collect().toSeq == plain.collect().toSeq)

    // the probe's selectivity: prefiltered fact strictly smaller than
    // the fact, and at least the true match count (no false negatives)
    val dim = graft.lake.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
    val filter = BloomJoin.buildFilter(dim, "c_custkey")
    val fact = graft.lake.Tables.orders(spark, sf)
    val pre = fact.filter(BloomJoin.probe(spark, filter, "o_custkey")).count()
    val trueMatches = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .count()
    assert(pre < fact.count(), s"probe shed nothing: $pre")
    assert(pre >= trueMatches, s"probe lost matches: $pre < $trueMatches")
  }

  test("probe plan: no shuffle before the filter, probe inside a codegen span") {
    val dim = graft.lake.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
    val filter = BloomJoin.buildFilter(dim, "c_custkey")
    val pre = graft.lake.Tables.orders(spark, sf)
      .filter(BloomJoin.probe(spark, filter, "o_custkey"))
    val plan = pre.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty, s"probe stage should not shuffle:\n$plan")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s"no codegen span:\n$plan")
  }
}
