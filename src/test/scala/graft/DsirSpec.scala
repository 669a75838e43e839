package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Dsir

/** DSIR importance weighting/resampling (t42/t43) — pinned against a
  * plain-Scala brute-force reference over the real sf0.001 corpus
  * (feature hashing, add-one-smoothed integer ratios, mean score,
  * content-keyed coin — every doc), plus directional semantics on a
  * planted fixture: a raw doc made of target-only bigrams must
  * outscore a raw doc made of bigrams the target never contains.
  */
class DsirSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** Plain-Scala reference of the whole t42/t43 pipeline. */
  private def brute(docs: Seq[(Long, String, String)])
      : (Map[Long, (Long, Long)], Set[Long]) = {
    val b = Dsir.Buckets
    def feats(text: String): Seq[Long] = {
      val t = text.toLowerCase.split(" ", -1)
      (0 until t.length - 1).map(i => h32(t(i) + " " + t(i + 1)) % b)
    }
    val tf = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val rf = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((_, lang, text) <- docs; f <- feats(text))
      if (lang == Dsir.TargetLang) tf(f) += 1 else rf(f) += 1
    val tt = tf.values.sum; val rt = rf.values.sum
    def ratio(f: Long): Long =
      ((tf(f) + 1) * (rt + b) * 1000000L) / ((rf(f) + 1) * (tt + b))
    val w = docs.collect {
      case (id, lang, text) if lang != Dsir.TargetLang &&
          feats(text).nonEmpty =>
        val fs = feats(text)
        id -> ((fs.length.toLong, fs.map(ratio).sum / fs.length))
    }.toMap
    val kept = docs.collect {
      case (id, lang, text) if lang != Dsir.TargetLang &&
          w.contains(id) &&
          h60(text) % 1000000L < math.min(w(id)._2, 1000000L) => id
    }.toSet
    (w, kept)
  }

  test("t42/t43 ≡ brute-force reference over the whole sf0.001 corpus") {
    val docs = graft.lake.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (w, kept) = brute(docs)
    val t42 = Dsir.t42DsirWeights(spark, sf).collect()
    assert(t42.length == w.size)
    t42.foreach { r =>
      assert(w(r.getLong(0)) == ((r.getLong(1), r.getLong(2))),
        s"weight mismatch doc ${r.getLong(0)}")
    }
    val t43 = Dsir.t43DsirResample(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(t43 == kept, "resample survivor set mismatch")
    // the coin must actually drop someone and keep someone
    assert(kept.nonEmpty && kept.size < w.size,
      "fixture: resample is degenerate on this corpus")
  }

  test("persisted counts table: served ≡ inline, append ≡ rebuild, stale-stamp refusal") {
    val dir = java.nio.file.Files.createTempDirectory("dsir_idx").toString
    val all = graft.lake.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").localCheckpoint()
    all.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .write.parquet(s"$dir/documents.parquet")
    val inline42 = Dsir.t42DsirWeights(spark, dir).collect().toSeq
    val inline43 = Dsir.t43DsirResample(spark, dir).collect().toSeq
    Dsir.persistRatioTable(spark, dir)
    assert(Dsir.servedCounts(spark, dir).nonEmpty)
    // served ≡ inline — the derivation arithmetic is shared, so any
    // drift would be in the counts relation itself
    assert(Dsir.t42DsirWeights(spark, dir).collect().toSeq == inline42)
    assert(Dsir.t43DsirResample(spark, dir).collect().toSeq == inline43)

    // append the held-out 10% and compare against a from-scratch build
    val sig = Dsir.ratioStamp(spark, dir).get
    val inc = all.filter(pmod(col("doc_id"), lit(10)) === 0)
      .localCheckpoint()
    inc.write.mode("append").parquet(s"$dir/documents.parquet")
    Dsir.appendRatioTable(spark, dir, inc, sig)
    val appended = Dsir.servedCounts(spark, dir).get
      .orderBy("f").collect().toSeq
    val grown42 = Dsir.t42DsirWeights(spark, dir).collect().toSeq
    Dsir.dropRatioTable(spark, dir)
    Dsir.persistRatioTable(spark, dir)
    val rebuilt = Dsir.servedCounts(spark, dir).get
      .orderBy("f").collect().toSeq
    assert(appended == rebuilt,
      "merge-on-read of appended counts must equal a full rebuild")
    assert(Dsir.t42DsirWeights(spark, dir).collect().toSeq == grown42)

    // a stale handle must refuse, not silently double-count
    intercept[IllegalStateException] {
      Dsir.appendRatioTable(spark, dir, inc, sig)
    }
    Dsir.dropRatioTable(spark, dir)
  }

  test("log-domain estimator: AM–GM subset vs t43, measured gap non-degenerate") {
    val lw = Dsir.logWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val sw = Dsir.t42DsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(lw.keySet == sw.keySet)
    // geometric mean ≤ arithmetic mean, pointwise (±2 ppm flooring)
    lw.foreach { case (id, geo) =>
      assert(geo <= sw(id) + 2, s"doc $id: geo $geo > arith ${sw(id)}")
    }
    val logKept = Dsir.logResample(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val t43Kept = Dsir.t43DsirResample(spark, sf).collect()
      .map(_.getLong(0)).toSet
    // same coin + smaller score ⇒ survivors ⊆ t43's (boundary docs
    // within the 2-ppm flooring band excepted — none on this corpus)
    val escapees = logKept -- t43Kept
    assert(escapees.forall(id => lw(id) <= sw(id) + 2),
      s"log-domain kept docs the surrogate dropped beyond flooring: $escapees")
    // the documented divergence: the surrogate keeps a measurable but
    // bounded superset on the test corpus (order-of-magnitude pin —
    // both estimators must agree on the bulk of the pool)
    val gap = t43Kept.size - (logKept & t43Kept).size
    assert(gap >= 0 && gap <= t43Kept.size / 2,
      s"log-domain survivor set diverges from t43 beyond half: gap=$gap of ${t43Kept.size}")
    assert(logKept.nonEmpty, "log-domain resample is degenerate")
  }

  test("directional semantics: target-like raw doc outscores target-alien raw doc") {
    val d = java.nio.file.Files.createTempDirectory("dsir_fix").toString
    Seq(
      (0L, "en", "alpha beta gamma delta alpha beta gamma delta"),
      (1L, "en", "alpha beta gamma delta"),
      // raw doc 10 repeats the target's exact bigrams
      (10L, "de", "alpha beta gamma delta alpha beta"),
      // raw doc 11 shares no bigram with the target
      (11L, "de", "zeta eta theta iota zeta eta")
    ).toDF("doc_id", "lang", "text")
      .write.parquet(s"$d/documents.parquet")
    val scores = Dsir.t42DsirWeights(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(10L) > scores(11L),
      s"target-like doc did not outscore alien doc: $scores")
    assert(scores(10L) > 1000000L,
      "a doc of pure target bigrams should score above the 1.0 line")
  }

  test("t46 admission semantics: target cap, coin gate, featureless rejection") {
    val rows = Dsir.t46DsirAdmit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4)))
    assert(rows.nonEmpty)
    // every target-lang doc admitted at the cap
    val en = rows.filter(_._2 == Dsir.TargetLang)
    assert(en.nonEmpty && en.forall(r => r._3.contains(1000000L) && r._4 == 1),
      "target-language docs must pass at the probability-1 cap")
    // the gate is non-degenerate on the raw pool
    val raw = rows.filter(_._2 != Dsir.TargetLang)
    assert(raw.exists(_._4 == 1) && raw.exists(_._4 == 0),
      s"degenerate admission split on the raw pool")
    // a scored raw doc's admit bit equals t43's coin against its score
    val t43 = Dsir.t43DsirResample(spark, sf).collect()
      .map(_.getLong(0)).toSet
    raw.filter(_._3.nonEmpty).foreach { case (id, _, _, admit) =>
      assert((admit == 1) == t43.contains(id),
        s"doc $id: admit=$admit but t43 survivor=${t43.contains(id)}")
    }
  }

  test("dsirAdmitStream: streamed admission ≡ per-chunk batch admission; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("dsir_admit").toString
    val outPath = s"$base/admitted"
    val docs = graft.lake.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").localCheckpoint()
    val chunks = (0 until 3).map(i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))))
    // the batch twin, per chunk (ratios are corpus-frozen on both sides)
    val want = chunks.map { c =>
      Dsir.admitIncoming(spark, sf, c.toSeq.toDF("doc_id", "lang", "text"))
        .collect().map(_.toString).toSet
    }
    assert(want.forall(_.nonEmpty), "fixture produced empty admission sets")

    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.Streams.dsirAdmitStream(
      ms.toDF().toDF("doc_id", "lang", "text"), sf, outPath,
      s"$base/ckpt").start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      def batchRows(b: Long): Set[String] = spark.read.parquet(outPath)
        .filter(col("batch_id") === b).drop("batch_id")
        .collect().map(_.toString).toSet
      (0 until 3).foreach { i =>
        assert(batchRows(i.toLong) == want(i),
          s"streamed admission batch $i != batch admitIncoming")
      }
      // replay batch 1's body under its own batch_id — dynamic
      // overwrite must leave the store unchanged
      graft.text.Dsir.admitWith(
          Dsir.corpusRatios(spark, sf),
          chunks(1).toSeq.toDF("doc_id", "lang", "text"))
        .withColumn("batch_id", lit(1L))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(outPath)
      (0 until 3).foreach { i =>
        assert(batchRows(i.toLong) == want(i), "replay changed the store")
      }
    } finally q.stop()
  }
}
