package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** s12 incremental embedding admission ([[Similarity.admitEmbeddingIncrement]])
  * — the vector twin of d13's daily-crawl workflow. The oracle gate
  * hash-checks the full output at sf0.01; these pins cover what the
  * oracle can't see: that BOTH drop legs actually fire on the fixture,
  * that the memoized corpus index changes nothing, and that the family
  * is sized by the corpus (not the union).
  */
class EmbeddingAdmissionSpec extends AnyFunSuite {
  import TestSpark._

  private def normed(df: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    df.select(col("vec_id"), col("embedding"),
      expr("sqrt(graft_dot(embedding, embedding))").as("nrm"))
  }

  private lazy val e = normed(spark.read.parquet(s"$sf/embeddings.parquet"))
  private lazy val n = e.count()
  private lazy val cut = 4L * n / 5L
  private def ids(df: DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  test("admitted ids are a strict, non-empty subset of the increment") {
    val admitted = ids(Similarity.s12IncrementalAdmit(spark, sf))
    val inc = ids(e.filter(col("vec_id") >= cut))
    assert(admitted.nonEmpty, "admission dropped the whole increment")
    assert(admitted.subsetOf(inc))
    assert(admitted != inc, "admission dropped nothing — fixture regression")
  }

  test("both drop legs fire: intra-increment AND cross-corpus") {
    val inc = ids(e.filter(col("vec_id") >= cut))
    val full = ids(Similarity.s12IncrementalAdmit(spark, sf))
    // empty corpus frame, SAME corpus-sized family: only the intra leg
    val noCorpus = ids(Similarity.admitEmbeddingIncrement(
      e.limit(0), e.filter(col("vec_id") >= cut), familyN = cut))
    val droppedFull = inc -- full
    val droppedIntra = inc -- noCorpus
    assert(droppedIntra.nonEmpty, "intra leg never fired on the fixture")
    assert(droppedIntra.subsetOf(droppedFull),
      "an intra-dropped id was admitted by the full run")
    assert((droppedFull -- droppedIntra).nonEmpty,
      "cross leg never fired beyond the intra drops")
  }

  test("the memoized pre-partitioned corpus index is behavior-neutral") {
    val viaQuery = ids(Similarity.s12IncrementalAdmit(spark, sf))
    val direct = ids(Similarity.admitEmbeddingIncrement(
      e.filter(col("vec_id") < cut), e.filter(col("vec_id") >= cut),
      familyN = cut))
    assert(viaQuery == direct,
      "memoized corpus index diverges from the direct computation")
  }

  // ---- streaming twin -------------------------------------------------

  private def raw(df: DataFrame): DataFrame = df.select("vec_id", "embedding")

  test("admitEmbeddingStream: per-batch admission equals sequential batch admission") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("eadmit").toString
    val corpus = raw(e.filter(col("vec_id") < cut))
    val batch1 = raw(e.filter(col("vec_id") >= cut && col("vec_id") < cut + 40))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    // batch 2: the rest of the increment PLUS an exact re-id'd copy of a
    // corpus vector (cos 1.0 — must be rejected through the cross leg)
    val corpusCopy = raw(e.filter(col("vec_id") === 0))
      .collect().map(r => (9000001L, r.getSeq[Float](1)))
    val batch2 = raw(e.filter(col("vec_id") >= cut + 40))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))) ++ corpusCopy
    val ms = MemoryStream[(Long, Seq[Float])]
    val vecStream = ms.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = graft.streaming.Streams.admitEmbeddingStream(
      vecStream, corpus, s"$base/admitted", s"$base/ckpt",
      familyN = cut).start()
    try {
      ms.addData(batch1.toSeq)
      q.processAllAvailable()
      ms.addData(batch2.toSeq)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      val streamed = spark.read.parquet(s"$base/admitted")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      // reference: the nightly-batch workflow on the same two batches
      def inc(rows: Array[(Long, Seq[Float])]): DataFrame =
        normed(rows.toSeq.toDF("vec_id", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>")))
      val corpusNormed = e.filter(col("vec_id") < cut)
      val adm1 = ids(Similarity.admitEmbeddingIncrement(
        corpusNormed, inc(batch1), familyN = cut))
      val adm1Vecs = inc(batch1).filter(col("vec_id").isin(adm1.toSeq: _*))
      val adm2 = ids(Similarity.admitEmbeddingIncrement(
        corpusNormed.unionByName(adm1Vecs), inc(batch2), familyN = cut))
      assert(streamed == adm1 ++ adm2,
        "streamed admissions diverge from sequential batch admission")
      assert(!streamed.contains(9000001L), "corpus copy was admitted")
    } finally q.stop()
  }

  test("admitEmbeddingStream survives an all-rejected first batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("eadmit0").toString
    val corpus = raw(e.filter(col("vec_id") < cut))
    val copyOf0 = raw(e.filter(col("vec_id") === 0))
      .collect().map(r => (9100001L, r.getSeq[Float](1)))
    // a vector the batch workflow provably ADMITS (so batch 2 is the
    // first to create parquet footers in the store)
    val admissibleId = ids(Similarity.admitEmbeddingIncrement(
      e.filter(col("vec_id") < cut), e.filter(col("vec_id") >= cut),
      familyN = cut)).min
    val fresh = raw(e.filter(col("vec_id") === admissibleId))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Seq[Float])]
    val vecStream = ms.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = graft.streaming.Streams.admitEmbeddingStream(
      vecStream, corpus, s"$base/admitted", s"$base/ckpt",
      familyN = cut).start()
    try {
      ms.addData(copyOf0.toSeq) // only an exact corpus dup -> reject all
      q.processAllAvailable()
      ms.addData(fresh.toSeq)   // the store read must not crash-loop
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      val admitted = spark.read.parquet(s"$base/admitted")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(!admitted.contains(9100001L), "exact corpus copy admitted")
      assert(admitted == Set(admissibleId),
        "post-empty-batch admission diverged")
    } finally q.stop()
  }
}
