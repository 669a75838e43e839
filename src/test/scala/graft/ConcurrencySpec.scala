package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Lake

/** The optimistic commit guard (r14 verdict stretch #8): two guarded
  * writers racing an upsert — the loser THROWS at the stamp re-check
  * instead of silently erasing the winner's rows (the lost update
  * upsertByKey's single-writer contract documents), the winner's rows
  * survive, the loser's staging is cleaned up, and a retry from a
  * fresh read lands.
  */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("two-writer upsert race: loser throws at re-check, winner's rows survive, retry lands") {
    val dir = java.nio.file.Files.createTempDirectory("commit_guard")
    val p = s"$dir/store.parquet"

    // seed through the guard (creates store + first stamp)
    Lake.upsertByKeyGuarded(spark,
      Seq((1L, "base1"), (2L, "base2")).toDF("k", "v"), p, "k")
    assert(Lake.readCommitStamp(spark, p).nonEmpty, "seed did not stamp")

    // writer A reads its handle…
    val tA = Lake.readCommitStamp(spark, p)
    // …writer B commits in between (stamp moves)
    Lake.upsertByKeyGuarded(spark,
      Seq((2L, "B-won"), (3L, "B-new")).toDF("k", "v"), p, "k")

    // writer A's commit against the stale handle must fail…
    intercept[java.util.ConcurrentModificationException] {
      Lake.commitUpsert(spark,
        Seq((2L, "A-lost"), (4L, "A-new")).toDF("k", "v"), p, "k", tA)
    }
    // …without touching the store: B's rows survive, A's never landed
    val rows = spark.read.parquet(p).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows == Map(1L -> "base1", 2L -> "B-won", 3L -> "B-new"),
      s"store corrupted by the losing writer: $rows")
    // the loser's staging directory is cleaned up
    assert(!new java.io.File(p.stripSuffix("/") + "_upserting").exists(),
      "losing writer leaked its staging directory")

    // retry from a fresh read lands
    Lake.upsertByKeyGuarded(spark,
      Seq((2L, "A-retry"), (4L, "A-new")).toDF("k", "v"), p, "k")
    val after = spark.read.parquet(p).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(after == Map(1L -> "base1", 2L -> "A-retry", 3L -> "B-new",
      4L -> "A-new"), s"retry did not land: $after")
  }

  test("guarded create race: a writer that saw no store fails if one was stamped meanwhile") {
    val dir = java.nio.file.Files.createTempDirectory("commit_guard2")
    val p = s"$dir/store.parquet"
    val t0 = Lake.readCommitStamp(spark, p) // None — no store yet
    Lake.upsertByKeyGuarded(spark, Seq((1L, "first")).toDF("k", "v"), p, "k")
    intercept[java.util.ConcurrentModificationException] {
      Lake.commitUpsert(spark, Seq((1L, "second")).toDF("k", "v"), p, "k", t0)
    }
    val rows = spark.read.parquet(p).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows == Map(1L -> "first"))
  }
}
