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

  test("a delete spraying hundreds of partitions stays bounded and correct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("delkeys5").toString
    val rows = for { p <- 0 until 200; u <- 1 to 3 }
      yield ((p * 10 + u).toLong, f"$p%03d")
    rows.toDF("user_id", "dia")
      .write.mode("overwrite").partitionBy("dia").parquet(dir)
    // one key from EVERY partition: the former OR-of-ANDs predicate
    // would compile a 200-arm expression tree here; the In/InSet form
    // stays one node regardless of spray width
    val keys = (0 until 200).map(p => (p * 10 + 1).toLong)
    val removed = Lake.deleteByKeys(spark, dir, "user_id", keys, Seq("dia"))
    assert(removed == 200)
    val left = spark.read.parquet(dir)
    assert(left.count() == 400)
    assert(left.filter(col("user_id").isInCollection(keys)).count() == 0)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith("_old")), "aside debris left behind")
    // a hidden aside (the crash-between-renames state) must be invisible
    // to partition discovery — a visible `dia=xxx_old` sibling would
    // resurrect deleted rows under a bogus partition value
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$dir/dia=000"), fs,
      new org.apache.hadoop.fs.Path(s"$dir/.dia=000_old"), false, conf)
    assert(spark.read.parquet(dir).count() == 400,
      "dot-prefixed aside leaked into partition discovery")
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
