package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Lake

/** `Lake.deleteByKeys` — targeted GDPR-style deletion. The contract at
  * scale is not "the rows are gone" (any full rewrite does that) but
  * "ONLY the partitions containing a match were rewritten": pinned here
  * by comparing untouched partitions' file paths + lengths + mtimes
  * before and after.
  */
class DeleteByKeysSpec extends AnyFunSuite {
  import TestSpark._

  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(dir).map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  private def buildStore(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("delkeys").toString
    val rows = for {
      d <- Seq("01", "02", "03")
      u <- 1 to 10
    } yield (u.toLong, s"user$u-day$d", d)
    rows.toDF("user_id", "payload", "dia")
      .write.mode("overwrite").partitionBy("dia").parquet(dir)
    dir
  }

  test("removes exactly the matching rows and reports the count") {
    val dir = buildStore()
    val removed = Lake.deleteByKeys(spark, dir, "user_id",
      Seq(3L, 7L), Seq("dia"))
    assert(removed == 6, s"expected 2 users x 3 days, got $removed")
    val left = spark.read.parquet(dir)
    assert(left.count() == 24)
    assert(left.filter(col("user_id").isin(3L, 7L)).count() == 0)
    // surviving rows intact, partition layout preserved
    assert(left.filter(col("dia") === "02").count() == 8)
  }

  test("partitions without a match keep byte-identical files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("delkeys2").toString
    // user 99 exists ONLY on day 01; days 02/03 must not be rewritten
    val rows = Seq((99L, "x", "01")) ++ (for {
      d <- Seq("01", "02", "03"); u <- 1 to 5
    } yield (u.toLong, s"u$u", d))
    rows.toDF("user_id", "payload", "dia")
      .write.mode("overwrite").partitionBy("dia").parquet(dir)
    val before2 = fileState(new java.io.File(s"$dir/dia=02"))
    val before3 = fileState(new java.io.File(s"$dir/dia=03"))
    val removed = Lake.deleteByKeys(spark, dir, "user_id",
      Seq(99L), Seq("dia"))
    assert(removed == 1)
    assert(fileState(new java.io.File(s"$dir/dia=02")) == before2,
      "day-02 files were rewritten despite containing no match")
    assert(fileState(new java.io.File(s"$dir/dia=03")) == before3,
      "day-03 files were rewritten despite containing no match")
    assert(spark.read.parquet(dir).count() == 15)
  }

  test("no matching key is a no-op returning 0") {
    val dir = buildStore()
    val before = fileState(new java.io.File(dir))
    assert(Lake.deleteByKeys(spark, dir, "user_id",
      Seq(999L), Seq("dia")) == 0L)
    assert(fileState(new java.io.File(dir)) == before)
  }

  test("deleting every row of a partition leaves the store readable without it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("delkeys3").toString
    (Seq((1L, "01"), (2L, "01"), (3L, "02")))
      .toDF("user_id", "dia").write.mode("overwrite").partitionBy("dia").parquet(dir)
    val removed = Lake.deleteByKeys(spark, dir, "user_id",
      Seq(1L, 2L), Seq("dia"))
    assert(removed == 2)
    val left = spark.read.parquet(dir)
    assert(left.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("zero-padded partition values survive the rewrite (no 07 -> 7 drift)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("delkeys4").toString
    Seq((1L, "07"), (2L, "07"), (3L, "11"))
      .toDF("user_id", "mes").write.mode("overwrite").partitionBy("mes").parquet(dir)
    assert(Lake.deleteByKeys(spark, dir, "user_id", Seq(1L), Seq("mes")) == 1)
    assert(new java.io.File(s"$dir/mes=07").isDirectory,
      "zero-padded partition dir must keep its original name")
    assert(!new java.io.File(s"$dir/mes=7").exists())
    val left = spark.read.parquet(dir)
    assert(left.count() == 2)
  }
}
