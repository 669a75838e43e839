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

  test("two-writer index persist race: loser throws at token re-check, winner's table and stamp intact") {
    import graft.lake.IndexTables
    val dir = java.nio.file.Files.createTempDirectory("idx_guard").toString
    val p = s"$dir/corpus.parquet"
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v").write.parquet(p)
    val rel = spark.read.parquet(p)

    // writer A reads its handle on the empty slot…
    val tA = IndexTables.commitToken(spark, "cxg", p)
    assert(tA.isEmpty)
    // …writer B persists in between (fresh token lands)
    IndexTables.persist(spark, rel.withColumn("who", lit("B")),
      "cxg", p, Seq("k"), 2)
    val tB = IndexTables.commitToken(spark, "cxg", p)
    assert(tB.nonEmpty, "guarded persist did not write a commit token")

    // A's commit against the stale handle must fail — note the CORPUS
    // signature is identical for both writers, which is exactly why
    // the sig stamp cannot arbitrate this race and the token must
    intercept[java.util.ConcurrentModificationException] {
      IndexTables.commitPersist(spark, rel.withColumn("who", lit("A")),
        "cxg", p, Seq("k"), 2, tA)
    }
    // winner's table, rows, stamp, and token are intact; loser's
    // staging is dropped
    val served = IndexTables.serve(spark, "cxg", p)
    assert(served.nonEmpty, "winner's table no longer serves")
    assert(served.get.select("who").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("B"), "loser's rows leaked in")
    assert(IndexTables.commitToken(spark, "cxg", p) == tB)
    assert(!spark.catalog.tableExists(
      IndexTables.tableName("cxg", p) + "_staging"),
      "losing writer leaked its staging table")

    // retry from a fresh read lands
    IndexTables.persist(spark, rel.withColumn("who", lit("A2")),
      "cxg", p, Seq("k"), 2)
    assert(IndexTables.serve(spark, "cxg", p).get.select("who").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("A2"))
    IndexTables.drop(spark, "cxg", p)
  }

  test("compact loses to a writer that committed after its entry read; append moves the token") {
    import graft.lake.IndexTables
    val dir = java.nio.file.Files.createTempDirectory("idx_guard2").toString
    val p = s"$dir/corpus.parquet"
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(p)
    val rel = spark.read.parquet(p)
    IndexTables.persist(spark, rel, "cxh", p, Seq("k"), 2)

    // the maintainer reads its token, then an append commits (appends
    // move the token too — a racing rebuild built from pre-append rows
    // must not silently swap the appended rows away)
    val t0 = IndexTables.commitToken(spark, "cxh", p)
    val sig0 = IndexTables.stampOf(spark, "cxh", p).get
    Seq((3L, 30L)).toDF("k", "v").write.mode("append").parquet(p)
    IndexTables.appendIncrement(spark, Seq((3L, 30L)).toDF("k", "v"),
      "cxh", p, sig0, autoMaintain = false)
    val t1 = IndexTables.commitToken(spark, "cxh", p)
    assert(t1 != t0, "appendIncrement did not move the commit token")

    // the compact driven with the stale entry handle loses…
    intercept[java.util.ConcurrentModificationException] {
      IndexTables.commitCompact(spark, "cxh", p, t0)
    }
    // …and the appended table still serves with all three rows
    val rows = IndexTables.serve(spark, "cxh", p).get
      .select("k").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L, 3L), s"append lost to the stale compact: $rows")
    // a fresh compact succeeds and preserves the rows
    assert(IndexTables.compact(spark, "cxh", p).nonEmpty)
    assert(IndexTables.serve(spark, "cxh", p).get
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    IndexTables.drop(spark, "cxh", p)
  }

  private class CrashFailpoint extends RuntimeException("simulated crash")

  test("crashed winner between re-check and swap: recoverCommit replays it; a racing writer detects the intent (r16 verdict #5)") {
    val dir = java.nio.file.Files.createTempDirectory("commit_wal")
    val p = s"$dir/store.parquet"
    Lake.upsertByKeyGuarded(spark, Seq((1L, "base")).toDF("k", "v"), p, "k")
    val t = Lake.readCommitStamp(spark, p)

    // the winner's process dies between writing its intent and the swap
    intercept[CrashFailpoint] {
      Lake.commitUpsertImpl(spark,
        Seq((1L, "upd"), (2L, "new")).toDF("k", "v"), p, "k", t,
        () => throw new CrashFailpoint)
    }
    // store untouched, intent live on disk
    assert(Lake.readIntent(spark, p).nonEmpty, "no intent after the crash")
    def rows(): Map[Long, String] = spark.read.parquet(p).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows() == Map(1L -> "base"), "crash mutated the store")

    // a racing writer — even with a FRESH stamp read — refuses at the
    // live intent instead of slipping through the old residue window,
    // and refuses BEFORE building (the staging dir is shared)
    intercept[java.util.ConcurrentModificationException] {
      Lake.commitUpsert(spark, Seq((3L, "racer")).toDF("k", "v"), p, "k",
        Lake.readCommitStamp(spark, p))
    }
    assert(rows() == Map(1L -> "base"))
    assert(new java.io.File(p.stripSuffix("/") + "_upserting").exists(),
      "the racer clobbered the crashed winner's staging")

    // recovery replays the crashed commit to completion — no manual
    // repair: rows land, stamp moves to the winner's token, intent gone
    assert(Lake.recoverCommit(spark, p), "recoverCommit found nothing")
    assert(rows() == Map(1L -> "upd", 2L -> "new"),
      s"recovered store wrong: ${rows()}")
    assert(Lake.readIntent(spark, p).isEmpty, "intent survived recovery")
    assert(Lake.readCommitStamp(spark, p) != t, "stamp did not move")
    assert(!Lake.recoverCommit(spark, p), "recovery is not idempotent")

    // and ordinary guarded writes work again
    Lake.upsertByKeyGuarded(spark, Seq((3L, "after")).toDF("k", "v"), p, "k")
    assert(rows() == Map(1L -> "upd", 2L -> "new", 3L -> "after"))
  }

  test("crashed index persist between intent and metastore swap: recoverIndexCommit finishes it (r16 verdict #5)") {
    import graft.lake.IndexTables
    val dir = java.nio.file.Files.createTempDirectory("idx_wal").toString
    val p = s"$dir/corpus.parquet"
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(p)
    val rel = spark.read.parquet(p)
    IndexTables.persist(spark, rel.withColumn("who", lit("B")),
      "cxi", p, Seq("k"), 2)
    val tB = IndexTables.commitToken(spark, "cxi", p)

    // writer C dies between its intent write and the DROP/RENAME pair
    intercept[CrashFailpoint] {
      IndexTables.commitPersistImpl(spark, rel.withColumn("who", lit("C")),
        "cxi", p, Seq("k"), 2, tB, () => throw new CrashFailpoint)
    }
    // target still serves B; a racing persist refuses at ENTRY (before
    // clobbering C's staging)
    assert(IndexTables.serve(spark, "cxi", p).get.select("who").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("B"))
    intercept[java.util.ConcurrentModificationException] {
      IndexTables.commitPersist(spark, rel.withColumn("who", lit("D")),
        "cxi", p, Seq("k"), 2, IndexTables.commitToken(spark, "cxi", p))
    }
    assert(spark.catalog.tableExists(
      IndexTables.tableName("cxi", p) + "_staging"),
      "the racer clobbered the crashed winner's staging")

    // recovery finishes C's swap: table serves C's rows under C's token
    assert(IndexTables.recoverIndexCommit(spark, "cxi", p))
    assert(IndexTables.serve(spark, "cxi", p).get.select("who").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("C"),
      "recovery did not land the crashed winner's table")
    assert(IndexTables.commitToken(spark, "cxi", p) != tB)
    assert(!IndexTables.recoverIndexCommit(spark, "cxi", p))

    // ordinary lifecycle works again after recovery
    IndexTables.persist(spark, rel.withColumn("who", lit("E")),
      "cxi", p, Seq("k"), 2)
    assert(IndexTables.serve(spark, "cxi", p).get.select("who").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("E"))
    IndexTables.drop(spark, "cxi", p)
  }

  test("an orphaned unregistered staging directory does not poison later persists (r17 bench postmortem)") {
    import graft.lake.IndexTables
    val dir = java.nio.file.Files.createTempDirectory("idx_orphan").toString
    val p = s"$dir/corpus.parquet"
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(p)
    // plant the debris a SIGTERM'd writer leaves: the staging DIR on
    // disk with no catalog entry (a killed JVM takes its in-memory
    // catalog with it; here we mimic by creating the dir directly)
    val staging = IndexTables.tableName("cxo", p) + "_staging"
    val wh = spark.sessionState.conf.warehousePath.stripPrefix("file:")
    val loc = java.nio.file.Paths.get(wh, staging)
    java.nio.file.Files.createDirectories(loc)
    java.nio.file.Files.write(loc.resolve("part-junk"), Array[Byte](1, 2, 3))
    assert(!spark.catalog.tableExists(staging))
    // the persist must clear the debris and land (this threw
    // LOCATION_ALREADY_EXISTS before the fix)
    IndexTables.persist(spark, spark.read.parquet(p), "cxo", p, Seq("k"), 2)
    assert(IndexTables.serve(spark, "cxo", p).get
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    IndexTables.drop(spark, "cxo", p)
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
