package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.lake.{Bucketing, Tables}

/** The 100 TB design proof the r2 verdict named as the most important
  * untested claim: a fact-fact join over tables bucketed on the join
  * key must plan WITHOUT any Exchange — co-location replaces the
  * shuffle.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-fact join plans with no Exchange, results match the shuffle join") {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "li_bkt", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "ord_bkt", "o_orderkey", buckets = 8)

    // disable the broadcast path: at sf0.001 the threshold would turn
    // this into a BroadcastExchange and hide the property under test
    // (at 100 TB neither fact is broadcastable)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedEquiJoin(
        spark, "li_bkt", "ord_bkt", "l_orderkey", "o_orderkey")
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located merge/hash join:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use the bucket layout:\n$plan")

      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == plain, s"bucketed join rows $n != shuffle join rows $plain")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
