package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adjudication tool for the r3 verdict's w6 finding: times the
  * two-exchange (plain groupBy) and one-exchange (repartition-first)
  * forms of the range-rolling query back to back on sf0.1 and counts
  * the shuffle exchanges in each final AQE plan. Evidence lands in
  * PROGRESS.md; the winning form is what `CoreQueries.w6RangeRolling`
  * ships.
  *
  *   sbt "runMain graft.tools.W6Compare"
  */
object W6Compare {
  private def shuffles(df: DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save()
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          n += 1; s.children.foreach(walk)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  private def time(label: String, mk: () => DataFrame): Unit = {
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$label: exchanges=${shuffles(mk())} times=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def lineitem = spark.read.parquet(s"$d/lineitem.parquet")
    val w = Window.partitionBy("l_suppkey").orderBy("day")
      .rangeBetween(-6, Window.currentRow)
    def finish(daily: DataFrame): DataFrame = daily
      .withColumn("qty_7d", round(sum("day_qty").over(w), 2).cast("double"))
      .select(col("l_suppkey"), col("day").cast("int").as("day"), col("qty_7d"))
      .orderBy("l_suppkey", "day")

    def twoExchange() = finish(
      lineitem
        .groupBy(col("l_suppkey"),
          datediff(col("l_shipdate"), lit("1970-01-01")).as("day"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("day_qty")))

    def oneExchange() = finish(
      lineitem
        .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"))
        .repartition(col("l_suppkey"))
        .groupBy(col("l_suppkey"),
          datediff(col("l_shipdate"), lit("1970-01-01")).as("day"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("day_qty")))

    // warmup both shapes
    twoExchange().write.format("noop").mode("overwrite").save()
    oneExchange().write.format("noop").mode("overwrite").save()
    time("two-exchange (plain groupBy)", () => twoExchange())
    time("one-exchange (repartition-first)", () => oneExchange())
    // density stat that decides the 100 TB trade-off
    val rows = lineitem.count()
    val groups = lineitem.select(col("l_suppkey"),
      datediff(col("l_shipdate"), lit("1970-01-01"))).distinct().count()
    println(f"rows=$rows groups=$groups rows/group=${rows.toDouble / groups}%.2f")
    spark.stop()
  }
}
