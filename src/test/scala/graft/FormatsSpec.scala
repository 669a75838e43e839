package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Lake

/** Source-format breadth beyond parquet: CSV with reject quarantine
  * (the lake interchange format) and ORC (the other columnar format a
  * lake migration encounters) — roundtrip fidelity plus the scan-level
  * properties that matter at 100 TB (predicate pushdown, column
  * pruning).
  */
class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  test("readCsv: explicit schema, malformed rows quarantine, clean rows parse typed") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part1.csv"),
      """id,price,day
        |1,10.5,2024-01-01
        |2,not_a_number,2024-01-02
        |3,30.25,2024-01-03
        |broken row with no commas at all maybe,,,,,
        |5,50.0,2024-01-05
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("price", DoubleType),
      StructField("day", DateType)))
    val (clean, rejects) = Lake.quarantine(
      Lake.readCsv(spark, dir, schema))
    val cleanRows = clean.orderBy("id").collect()
    // row 2 has a malformed price: PERMISSIVE nulls the field and
    // captures the raw line; row 4 is structurally broken
    assert(rejects.count() == 2, rejects.collect().mkString("; "))
    assert(cleanRows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    assert(cleanRows.head.getDouble(1) == 10.5)
    assert(cleanRows.head.getDate(2).toString == "2024-01-01")
    val raw = rejects.collect().map(_.getString(0)).mkString("\n")
    assert(raw.contains("not_a_number") && raw.contains("broken row"))
  }

  test("ORC roundtrip preserves lineitem values; filters and projections reach the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString + "/li"
    val src = graft.lake.Tables.lineitem(spark, sf)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // roundtrip fidelity on an exact aggregate
    def fp(df: org.apache.spark.sql.DataFrame) = df.agg(
      count(lit(1)),
      sum(expr("cast(floor(l_extendedprice * 100) as bigint)"))).collect()(0)
    assert(fp(back) == fp(src))
    // pushdown + pruning: same contract the parquet scans are held to
    val q = back.filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.contains("GreaterThan(l_quantity"),
      s"quantity filter not pushed into the ORC scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"projection not pruned to 2 columns:\n$scan")
    assert(q.count() == src.filter(col("l_quantity") > 45).count())
  }
}
