package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{BloomAggregator, BloomFilterFn, BloomKernel}
import graft.lake.Tables._

/** Explicit runtime-filter join: build a Bloom filter over the
  * (filtered) dim keys, shed fact rows at the scan, then run the exact
  * join — the j8 query. See [[graft.functions.BloomKernel]] for the
  * no-false-negative guarantee that makes the result IDENTICAL to the
  * plain join (the oracle runs the plain SQL).
  *
  * Scale shape (100 TB): the fact side streams ONCE through a
  * codegen'd k-hash probe BEFORE the join exchange — with a selective
  * dim predicate (here 1 segment of 5) the shuffle carries ~20% of the
  * fact. The dim passes twice (count for sizing + build), both narrow
  * single-column scans of the SMALL side. The collected filter is
  * m/8+1 bytes — a parameter (fpp), not data-sized: the
  * PQ-codebook-style bounded collect. Dim sides too large to bound
  * this way belong to Spark's own injected shuffle-side bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), which this
  * explicit form complements for scans the optimizer won't touch
  * (iterative fixpoint inputs, custom operators, streams).
  */
object BloomJoin {

  /** Build a serialized Bloom filter over a Long key column; bounded
    * driver collect (one m/8+1-byte row).
    */
  def buildFilter(keys: DataFrame, keyCol: String,
      fpp: Double = 0.01): Array[Byte] = {
    val ds = keys.select(col(keyCol).cast("long")).na.drop()
    import ds.sparkSession.implicits._
    val typed = ds.as[Long]
    val n = math.max(1L, typed.count())
    val (numBits, k) = BloomKernel.sizeFor(n, fpp)
    typed.select(new BloomAggregator(numBits, k).toColumn).head()
  }

  /** The probe predicate for a fact key column (by name) against a
    * built filter: the filter bytes inline as a hex BINARY literal so
    * the whole predicate lives in one codegen'd SQL expression.
    */
  def probe(spark: SparkSession, filter: Array[Byte], keyCol: String): Column = {
    BloomFilterFn.ensureRegistered(spark)
    val hex = filter.map("%02x".format(_)).mkString
    expr(s"graft_bloom_contains(x'$hex', CAST($keyCol AS BIGINT))")
  }

  /** j8: orders ⋈ customer restricted to one market segment, with the
    * fact side bloom-pruned before the join. Result provably equals
    * the plain join (oracle = plain SQL).
    */
  def j8BloomJoin(s: SparkSession, d: String): DataFrame = {
    val dim = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val filter = buildFilter(dim, "c_custkey")
    val fact = orders(s, d)
      .filter(probe(s, filter, "o_custkey"))
    fact.join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderpriority")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j8_bloom_join" -> (j8BloomJoin _))

  def oracles: Map[String, String] = Map(
    "j8_bloom_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)
}
