package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.CoreQueries

object TestSpark {
  lazy val spark: SparkSession = {
    // Hive-backed session catalog (local Derby metastore + warehouse in
    // temp dirs) so K2's saveAsTable registration is a real metastore
    // round-trip, matching Glue Catalog semantics.
    val base = java.nio.file.Files.createTempDirectory("graft_test").toString
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Count ShuffleExchanges in a FINAL AQE plan (descends into
    * AdaptiveSparkPlanExec/QueryStageExec, which plain collect does
    * not). Materialize with a noop write first.
    */
  def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case other => other.children.map(walk).sum
      }
      self + kids + p.subqueries.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}

class CoreQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("every core query runs and (except empty-by-construction) returns rows") {
    val mayBeEmpty = Set("j3_anti_join")
    CoreQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(mayBeEmpty(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("a1 top5 has exactly 5 rows, descending totals") {
    val rows = CoreQueries.a1GroupbySumTop5(spark, sf).collect()
    assert(rows.length == 5)
    val totals = rows.map(_.getDouble(2))
    assert(totals.sameElements(totals.sortBy(-_)))
  }

  test("o7 latest-per-key is the aggregate shape: no Window, no per-row sort") {
    val df = CoreQueries.o7LatestPerKey(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"o7 planned as a window (full shuffle+sort of the log):\n$plan")
    assert(plan.contains("Aggregate"),
      s"o7 is not an aggregate:\n$plan")
    // and the winner per key really is the (ts, event_id)-max row
    val events = graft.lake.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val want = events.groupBy(_._1).view
      .mapValues(_.maxBy(e => (e._3, e._2))._2).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("every query key has either an oracle or a documented omission") {
    val keys = CoreQueries.queries.keySet
    assert(CoreQueries.oracles.keySet.subsetOf(keys))
  }

  test("a6 HLL sketch stays within 5% of the exact distinct count") {
    // within_bounds IS the 5% check, computed inside the query so the
    // DuckDB oracle (constant-true column) hash-gates it per round
    val rows = CoreQueries.a6ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: exact count missing")
      assert(r.getInt(2) == 1,
        s"${r.getString(0)}: sketch outside 5% of exact=${r.getLong(1)}")
    }
  }

  test("graft_dot resolves via SparkSessionExtensions injection") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // force TestSpark init first
    // getOrCreate returns the existing default session (ignoring
    // extensions), so clear it to get a genuinely new session over the
    // same SparkContext, then restore.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions: spark.sql.extensions is a STATIC conf read from
      // the SparkContext at launch, which this shared-context test can't
      // change; production sessions set the config, tests inject direct
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      // no VectorExpressions.ensureRegistered call — the extension did it
      val v = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(v == 11.0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("NullFilterToAntiJoin rewrites p2's left-join-IS-NULL into a single-shuffle anti join") {
    val df = CoreQueries.p2IsnullOuterJoin(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"expected the custom rule to plan an anti join:\n$plan")
    assert(!plan.contains("LeftOuter"), s"outer join survived:\n$plan")
    // results identical to the as-written semantics (j3 shape)
    val viaRule = df.collect().map(_.getLong(0)).toSet
    val expected = graft.lake.Tables.orders(spark, sf)
      .join(graft.lake.Tables.lineitem(spark, sf).select("l_orderkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"), "left_anti")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaRule == expected)
  }

  test("NullFilterToAntiJoin does NOT fire when the equality can match a null attribute (ADVICE r2 high)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = Seq(Some(1L), None).toDF("rk")
    // disjunction: the (5, flag=1) row matches BOTH right rows via the
    // flag arm, so a matched output row carries rk = null — the IS NULL
    // filter must keep it; the anti-join rewrite would drop it.
    val or = Seq((5L, 1)).toDF("lk", "flag")
      .join(r, col("lk") === col("rk") || col("flag") === 1, "left")
      .filter(col("rk").isNull)
    assert(!or.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
      "rule fired on a disjunctive condition")
    assert(or.count() == 1)
    // null-tolerant operand: coalesce(rk, 0) = lk matches rk = null to
    // lk = 0 — again a matched row with a null attribute.
    val co = Seq(0L).toDF("lk")
      .join(r, coalesce(col("rk"), lit(0L)) === col("lk"), "left")
      .filter(col("rk").isNull)
    assert(!co.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
      "rule fired on a null-tolerant equality operand")
    assert(co.count() == 1)
  }

  test("two graft_dot calls in one projection codegen cleanly (freshName, ADVICE r2)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // non-nullable children make nullSafeCodeGen splice the block
    // un-braced at method scope — fixed local names would redeclare and
    // janino would throw here (generate() has no interpreted fallback)
    val arr = Literal.create(Array(1.0, 2.0), ArrayType(DoubleType, false))
    val proj = GenerateMutableProjection.generate(Seq(
      graft.functions.DotProduct(arr, arr),
      graft.functions.DotProduct(arr, arr)))
    val row = proj(InternalRow.empty)
    assert(row.getDouble(0) == 5.0 && row.getDouble(1) == 5.0)
  }

  test("approx_percentile tracks the exact percentile within bound (the 100 TB path for a5)") {
    import org.apache.spark.sql.functions._
    // t-digest-style sketch: partial-aggregable, merge-order-dependent,
    // so no cross-engine oracle — spec-bounded against the exact form
    // instead (same pattern as a6's HLL check)
    graft.lake.Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(
        expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 1000)").as("ap"),
        expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("ex"))
      .collect().foreach { r =>
        val ap = r.getSeq[Double](1)
        val ex = r.getSeq[Double](2)
        ap.zip(ex).foreach { case (a, e) =>
          assert(math.abs(a - e) / math.abs(e) < 0.05,
            s"${r.getString(0)}: approx=$a exact=$e")
        }
      }
  }

  test("j1 plan broadcasts the dimension side") {
    val plan = CoreQueries.j1JoinBroadcastAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("p1 filter is pushed down to the parquet scan") {
    val plan = CoreQueries.p1FilterNeq(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type)"),
      s"expected pushed filters:\n$plan")
  }

  test("w9 funnel is ORDER-sensitive: steps out of sequence do not count") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val e = Seq(
      // user 1: click BEFORE the view -> click must not count
      (1L, t(1), 10L, "click"), (1L, t(2), 11L, "view"), (1L, t(3), 12L, "purchase"),
      // user 2: in order -> full conversion
      (2L, t(1), 20L, "view"), (2L, t(2), 21L, "click"), (2L, t(3), 22L, "purchase"),
      // user 3: purchase before the click -> purchase must not count
      (3L, t(1), 30L, "view"), (3L, t(2), 31L, "purchase"), (3L, t(3), 32L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = CoreQueries.funnelStages(e).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == ((1, 0, 0)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((1, 1, 1)))
    assert(got(3L) == ((1, 1, 0)), s"user 3: ${got(3L)}")
  }
}
