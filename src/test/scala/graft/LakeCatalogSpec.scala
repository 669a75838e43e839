package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Lake

/** K2 catalog registration (ETL_glue_pregao_B3.json:240-268 — Glue
  * Catalog `tech_fiap.b3_fiap`, schema/partition updates enabled) and
  * the compaction maintenance op, exercised against the Hive metastore
  * the test session carries (r1 verdict items #7/#8).
  */
class LakeCatalogSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def refinedFrame(n: Int) =
    (1 to n).map(i => (s"COD$i", s"ACAO${i % 3}", i.toLong, "2025-08-01"))
      .toDF("cod", "acao", "total_qtde_teorica_dos_ultimos_7_dias", "created_at")

  test("K2: writeRefined registers tech_fiap.b3_fiap in the metastore with partitions") {
    spark.sql("CREATE DATABASE IF NOT EXISTS tech_fiap")
    val path = Files.createTempDirectory("refined").toString + "/b3_fiap"
    Lake.writeRefined(refinedFrame(6), path, Some("tech_fiap.b3_fiap"))
    try {
      assert(spark.catalog.tableExists("tech_fiap.b3_fiap"))
      val back = spark.table("tech_fiap.b3_fiap")
      assert(back.count() == 6)
      // partition layout (acao, created_at) on disk, Glue-style
      val acaoDirs = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("acao=")).map(_.getName).sorted
      assert(acaoDirs.sameElements(Array("acao=ACAO0", "acao=ACAO1", "acao=ACAO2")))
      // append mode: a second daily run accumulates (Glue sink is append)
      Lake.writeRefined(refinedFrame(6), path, Some("tech_fiap.b3_fiap"))
      assert(spark.table("tech_fiap.b3_fiap").count() == 12)
      // catalog sees the partition columns, not just the files
      val parts = spark.sql("SHOW PARTITIONS tech_fiap.b3_fiap").collect()
      assert(parts.nonEmpty &&
        parts.head.getString(0).startsWith("acao="))
    } finally spark.sql("DROP TABLE IF EXISTS tech_fiap.b3_fiap")
  }

  test("K2 schema evolution: a drifted batch evolves the catalog; old rows read null (Glue UPDATE_IN_DATABASE parity)") {
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE DATABASE IF NOT EXISTS tech_fiap")
    val path = Files.createTempDirectory("refined_evo").toString + "/b3_evo"
    Lake.writeRefined(refinedFrame(4), path, Some("tech_fiap.b3_evo"))
    try {
      // day 2 drifts: an extra `volume` column appears upstream — the
      // reference evolves the Glue catalog (UPDATE_IN_DATABASE); we must
      // evolve the metastore schema, not fail and not drop the column
      val drifted = refinedFrame(4)
        .withColumn("volume",
          col("total_qtde_teorica_dos_ultimos_7_dias") * 2)
      Lake.writeRefined(drifted, path, Some("tech_fiap.b3_evo"))
      val back = spark.table("tech_fiap.b3_evo")
      assert(back.columns.contains("volume"),
        s"catalog schema did not evolve: ${back.columns.mkString(",")}")
      assert(back.count() == 8)
      assert(back.filter(col("volume").isNull).count() == 4,
        "pre-drift rows must read the new column as null")
      assert(back.filter(col("volume").isNotNull).count() == 4)
      // drift the OTHER way: a later batch missing the evolved column
      // still appends (null-filled), like a thinner upstream day
      Lake.writeRefined(refinedFrame(2), path, Some("tech_fiap.b3_evo"))
      val after = spark.table("tech_fiap.b3_evo")
      assert(after.count() == 10)
      assert(after.filter(col("volume").isNull).count() == 6)
    } finally spark.sql("DROP TABLE IF EXISTS tech_fiap.b3_evo")
  }

  test("compact rewrites a many-small-files table in place and preserves the data") {
    val path = Files.createTempDirectory("compactme").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(50).write.parquet(path)
    def dataFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles == 50)
    Lake.compact(spark, path)
    assert(dataFiles == 1, s"expected 1 file after compact, got $dataFiles")
    // no orphan tmp dir left behind (r1: compact previously wrote a
    // copy and never swapped)
    assert(!new java.io.File(path + "_compacting").exists())
    // nor the rename-aside dir (r2 ADVICE: swap is old->_old, tmp->old,
    // delete _old — so a crash never leaves the table path empty)
    assert(!new java.io.File(path + "_old").exists())
    val back = spark.read.parquet(path)
    assert(back.count() == 1000)
    assert(back.agg(Map("id" -> "sum")).head.getLong(0) == 500500L)
  }
}
