package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.ops.Formats

/** Structured-Streaming surface of the reference (SURVEY.md §2.9):
  *
  *   T1  1 Hz point ingest loop    (/root/reference/src/ingest_strem_btc.py:44-58)
  *   T2  64 MB / 60 s buffered delivery to the lake
  *       (/root/reference/src/create_firehose_stream.py:27-48)
  *   T3  file-arrival-triggered downstream job — the S3→SQS→Lambda chain
  *       (/root/reference/src/sqs.py:63-87, trigger_glue.py:5-29), which
  *       Structured Streaming's file source IS, natively
  *   T4  stream status polling     (create_firehose_stream.py:51-67)
  *
  * Design: sources and sinks are declared, state lives in the
  * checkpoint. The same transformation functions run on batch frames
  * (SparkEntry's `st*` queries give them DuckDB oracles) and on
  * streaming frames (MemoryStream drives them in tests) — Spark's
  * unified batch/stream plan is the point, there is no separate
  * streaming engine to maintain.
  *
  * Scale notes (100 TB/day ingest): the file source scales by listing
  * cost — at real volume set `maxFilesPerTrigger`, keep the raw zone
  * date-partitioned so listing stays bounded; the watermark bounds
  * window state, so the stateful agg's memory is (windows in flight ×
  * keys), independent of stream length.
  */
object Streams {

  /** T1: the 1 Hz tick source. Spark's rate source replaces the
    * reference's `while True: sleep(1)` loop; `priceOf` abstracts the
    * REST fetch (src/ingest_strem_btc.py:24-33) — production swaps in a
    * `mapPartitions` HTTP call; tests and local runs use the default
    * deterministic synthetic price so the pipeline is reproducible.
    */
  def tickSource(spark: SparkSession, rowsPerSecond: Int = 1,
      priceOf: Column => Column = syntheticPrice): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        col("timestamp").as("data_hora"),
        priceOf(col("value")).as("preco_brl"))

  /** Deterministic fake BTC/BRL price: bounded random walk around the
    * reference's observed magnitude (~600k BRL).
    */
  def syntheticPrice(seq: Column): Column =
    round(lit(600000.0) + pmod(seq * 7919, lit(20000)) - 10000.0, 2)

  /** The JSON record shape Firehose receives
    * (src/ingest_strem_btc.py:52-56): `{"timestamp": "...", "price": N}`.
    */
  def asTickJson(df: DataFrame): DataFrame =
    df.select(Formats.tickJson(
      Formats.tsString(col("data_hora")), col("preco_brl")).as("value"))

  /** Parse the tick JSON back to typed rows — the read side of K5 (what
    * a consumer of the Firehose-delivered zone runs). `from_json` with
    * the declared schema; malformed records become null-field rows
    * (PERMISSIVE), preserved rather than dropped.
    */
  def parseTickJson(df: DataFrame)
      : org.apache.spark.sql.Dataset[graft.model.BtcTick] = {
    import df.sparkSession.implicits._
    df.select(from_json(col("value"), graft.model.Schemas.btcStream).as("t"))
      .select(col("t.timestamp"), col("t.price"))
      .as[graft.model.BtcTick]
  }

  /** T2: buffered micro-batch delivery. The 60 s ProcessingTime trigger
    * reproduces Firehose's IntervalInSeconds=60 buffering hint
    * (create_firehose_stream.py:35-38); Spark has no size-based trigger,
    * so SizeInMBs=64 maps to the trigger interval alone — documented
    * deviation, same delivery semantics (at-least-once into the dir,
    * exactly-once with the checkpoint).
    */
  def bufferedSink(df: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
      format: String = "json"): DataStreamWriter[Row] =
    df.writeStream
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .outputMode("append")

  /** T3: file-arrival-triggered processing. The file source + checkpoint
    * IS the S3-event→SQS→Lambda chain: each new file under `path` is
    * processed exactly once; `Trigger.AvailableNow` gives the
    * run-per-arrival batch shape with maxConcurrentRuns=1 semantics for
    * free (one query, one checkpoint).
    */
  def rawZoneStream(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      path: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1000)
      .parquet(path)

  /** Watermarked tumbling-window aggregate — the natural composition of
    * T1→T2 (SURVEY §2.9 extension). Works identically on batch and
    * streaming inputs; on a stream the watermark lets Spark drop window
    * state once event time passes window end + `lateness`.
    */
  def tumblingAgg(df: DataFrame, tsCol: String, valueCol: String,
      window: String = "1 hour", lateness: String = "2 minutes",
      stream: Boolean = true): DataFrame = {
    val in = if (stream) df.withWatermark(tsCol, lateness) else df
    in.groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(
        count(lit(1)).as("n_ticks"),
        round(sum(col(valueCol).cast("decimal(18,6)")), 2)
          .cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("n_ticks"), col("total_value"))
  }

  /** Sliding (hop) window twin of [[tumblingAgg]] — each event lands in
    * size/slide windows (2 for the 2h/1h default), assigned by the
    * `window()` generator in a projection (never a self-union of the
    * stream). Same watermark contract: state for a window drops once
    * event time passes its end + `lateness`; a hop window holds state
    * for size/slide× as many open windows as the tumbling form — slide
    * is the state-size knob. Batch form = [[graft.queries.EventAnalytics
    * .w10SlidingWindow]]'s shape; equivalence is pinned in
    * StreamingSpec.
    */
  def hopAgg(df: DataFrame, tsCol: String, valueCol: String,
      size: String = "2 hours", slide: String = "1 hour",
      lateness: String = "2 minutes", stream: Boolean = true): DataFrame = {
    val in = if (stream) df.withWatermark(tsCol, lateness) else df
    in.groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), size, slide))
      .agg(
        count(lit(1)).as("n_ticks"),
        round(sum(col(valueCol).cast("decimal(18,6)")), 2)
          .cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("n_ticks"), col("total_value"))
  }

  /** Native session-window aggregation — Spark's `session_window`
    * generator: per-key sessions that extend while events arrive within
    * `gap` of the last one, exactly the sessionization w4 builds with
    * lag + running sum. The native form is the STREAMING one: on a
    * stream the state store merges windows incrementally and the
    * watermark closes sessions whose end passed it — the lag/cumsum
    * form can't run on unbounded input at all (its window scans the
    * whole history). Batch output equality between the two forms is
    * pinned by st3's oracle (a lag/cumsum replication in DuckDB).
    *
    * Merge semantics (matters at exact-boundary gaps, pinned in
    * StreamingSpec): an event arriving EXACTLY `gap` after its
    * predecessor still EXTENDS the session — a new session starts only
    * when the gap is exceeded strictly (the same `> gap` rule as w4's
    * lag/cumsum form). Session end = last event + gap.
    */
  def sessionAgg(df: DataFrame, tsCol: String, keyCol: String,
      gap: String = "1 hour", lateness: String = "2 minutes",
      stream: Boolean = true): DataFrame = {
    val in = if (stream) df.withWatermark(tsCol, lateness) else df
    in.groupBy(col(keyCol),
        org.apache.spark.sql.functions.session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"))
  }

  /** Stream-stream inner join on an equi key + event-time interval —
    * the attribution shape (impression ↔ conversion within a window)
    * that needs BOTH sides buffered in state. Watermarks on both
    * streams plus the two-sided time condition are what let Spark
    * bound that state: a left row can be dropped once the right
    * watermark passes `lts + after`, and vice versa — without the
    * interval both sides buffer forever (Spark refuses the plan in
    * append mode). Batch equivalent: [[graft.ops.RangeJoin.banded]]
    * (same semantics, bucketed equi-join instead of state buffers);
    * equivalence is pinned in StreamingSpec.
    *
    * Columns must be pre-renamed so the two sides share no names; the
    * join condition references them directly.
    *
    * `joinType` extends to the outer forms ("left_outer" etc.) — on a
    * stream an unmatched left row emits null-padded ONLY after the
    * right watermark passes its interval end (the engine must prove no
    * future match can arrive), so outer results trail the watermark by
    * design; the spec pins this emission timing.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      beforeSec: Long, afterSec: Long,
      lateness: String = "1 minute",
      stream: Boolean = true,
      joinType: String = "inner"): DataFrame = {
    val l = if (stream) left.withWatermark(leftTs, lateness) else left
    val r = if (stream) right.withWatermark(rightTs, lateness) else right
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
        s"$rightTs >= $leftTs - interval $beforeSec seconds AND " +
        s"$rightTs <= $leftTs + interval $afterSec seconds"),
      joinType)
  }

  /** Streaming K3: append each micro-batch to a JDBC table via
    * foreachBatch — the streaming twin of the reference's poll-loop →
    * SQLite INSERT (bitoin_coin_gecko_api.py:50-54). foreachBatch gives
    * at-least-once into the DB (exactly-once needs an idempotent key or
    * txn dedup — documented contract, same as Firehose DirectPut).
    */
  def jdbcSink(df: DataFrame, url: String, table: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ingest.Jdbc.append(batch, url, table)
      }

  /** Streaming corpus admission — [[graft.text.Dedup.admitIncrement]]
    * as a continuously-running gate: each micro-batch of candidate docs
    * is near-dedup-checked against the static curated corpus AND
    * everything admitted in earlier batches, then appended to the
    * admitted store. The batch-side dedup logic is reused verbatim
    * (foreachBatch), so streaming and nightly-batch admission cannot
    * drift.
    *
    * Scale/robustness contracts:
    *   - The static corpus's band index is computed ONCE here and
    *     reused every batch (pass a persisted [[graft.text.Dedup.bandIndex]]
    *     via `corpusBands` to skip even that); only the (small)
    *     admitted-so-far store re-indexes per batch.
    *   - Batch writes are IDEMPOTENT: each batch lands in its own
    *     `batch_id=` partition via dynamic partition overwrite, so a
    *     replayed micro-batch (failure between write and commit)
    *     overwrites itself instead of duplicating — exactly-once
    *     downstream despite foreachBatch's at-least-once contract.
    *   - Cross-batch duplicates are rejected because the admitted
    *     store is probed alongside the corpus.
    */
  /** STREAMING DECONTAMINATION (r13 verdict stretch #9) — d14's stream
    * twin, the [[admitStream]] posture applied to the benchmark
    * screen: each micro-batch of candidate training docs is
    * fingerprint-probed against the benchmark suite and the flagged
    * contaminations land per batch. The screen is
    * [[graft.text.Winnowing.decontaminate]] REUSED VERBATIM via
    * foreachBatch, fed the benchmark's fingerprint set precomputed
    * once here — streamed and batch decontamination share one
    * implementation and cannot drift.
    *
    * Scale/robustness contracts (the admitStream set, minus state —
    * decontamination is per-doc independent, so no cross-batch store
    * is probed):
    *   - the benchmark fingerprints are computed ONCE and broadcast
    *     into every batch's equi-join (the genuinely-small external
    *     benchmark posture — ~10⁴ docs, KBs of fingerprints);
    *   - batch writes are IDEMPOTENT: each batch lands in its own
    *     `batch_id=` partition via dynamic overwrite, so a replayed
    *     micro-batch overwrites itself (StreamingSpec pins streamed ≡
    *     batch d14 across ≥3 batches including a replay).
    */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
      flaggedPath: String, checkpoint: String,
      minShared: Long = 3L): DataStreamWriter[Row] = {
    val bf = graft.text.Winnowing.normalizedFingerprints(benchmark)
      .localCheckpoint()
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        decontaminateBatch(batch, bf, minShared)
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(flaggedPath)
      }
  }

  /** One micro-batch of the streaming screen — exposed so a replayed
    * batch can be driven directly in tests (idempotency is per-batch).
    * `benchFp` is the precomputed (doc_id, h) benchmark fingerprint
    * relation.
    */
  private[graft] def decontaminateBatch(batch: DataFrame,
      benchFp: DataFrame, minShared: Long): DataFrame =
    graft.text.Winnowing.decontaminate(batch, batch /* unused */,
      minShared, benchmarkIsSmall = true, benchFp = Some(benchFp))

  /** STREAMING SPAN SCREEN (r15; cross-batch fold-forward r16) —
    * t40's stream twin: each micro-batch of candidate docs gets its
    * duplicated-span coverage against
    * corpus ∪ earlier-ADMITTED-batches ∪ batch, and an admit flag
    * under the coverage ceiling — the boilerplate gate run BEFORE
    * docs land, the [[decontaminateStream]] posture applied to
    * exact-substring coverage. The screen is
    * [[graft.text.SubstringDedup.screenIncrement]] REUSED VERBATIM via
    * foreachBatch — streamed and batch screening share one
    * implementation and cannot drift (SubstringDedupSpec pins
    * screenIncrement ≡ t40 on the union; IncrementalDedupSpec pins
    * streamed ≡ cumulative screenIncrement across batches including a
    * replay and a cross-batch duplicate).
    *
    * Corpus side: the persisted `ngo` occurrence table when one
    * serves (the 100 TB default — scanned once per batch,
    * broadcast-probed by the micro-batch's distinct ngram hashes,
    * never shuffled), else occurrences computed once here and
    * localCheckpointed.
    *
    * Cross-batch memory (r15 verdict #3 — the screen was corpus-frozen
    * at stream start, so a boilerplate span first seen in batch 1 and
    * repeated in batch 3 flagged in neither): each batch's ADMITTED
    * docs' occurrence rows land in a `<flaggedPath>_occ` side store
    * partitioned by batch_id, and batch `bid` screens against the
    * corpus ∪ partitions STRICTLY EARLIER than bid — d13's
    * fold-forward admission posture. Admitted-only, mirroring
    * [[admitStream]]: folding rejects forward would let one spam burst
    * poison the screen for unrelated docs, so rejected docs' spans are
    * deliberately NOT remembered. KNOWN RESIDUE (ADVICE r16): a span
    * whose only prior sighting was inside a REJECTED doc is invisible
    * to later batches — if it next appears once in a new doc, neither
    * occurrence is flagged (the rejected doc never reaches the corpus
    * or the side store). That blind spot is the price of the
    * spam-poisoning defense and is accepted by design; a deployment
    * that wants rejected-doc memory can screen against the flagged
    * store's rejected rows at its own poisoning risk. The side
    * store is NOT the `ngo` table: that table is stamped as "exactly
    * the corpus's occurrence rows" and appending screened docs that
    * never land in the corpus would silently break its
    * append ≡ rebuild contract.
    *
    * Replay/idempotency (the joinViewStream strengthened set): both
    * stores write per-batch_id partitions via dynamic overwrite, and
    * the side-store read takes `batch_id < bid` only — a batch's
    * output is a pure function of the corpus and its predecessors, so
    * a replayed batch overwrites itself bit-identically even if later
    * batches already ran. The read is SCHEMA-PINNED (an all-rejected
    * batch leaves a footer-less partition dir).
    */
  def spanScreenStream(docs: DataFrame, corpusDir: String,
      flaggedPath: String, checkpoint: String,
      maxCoverageBp: Long =
        graft.text.SubstringDedup.MaxStreamCoverageBp): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    val corpusOcc = graft.text.SubstringDedup
      .servedOccurrences(spark, corpusDir)
      .getOrElse(graft.text.SubstringDedup
        .occurrencesOf(graft.lake.Tables.documents(spark, corpusDir))
        .localCheckpoint())
    val occPath = flaggedPath.stripSuffix("/") + "_occ"
    val occSchema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("s", org.apache.spark.sql.types.IntegerType)
      .add("ngh", org.apache.spark.sql.types.BinaryType)
      .add("batch_id", org.apache.spark.sql.types.LongType)
    def earlierOcc(bid: Long): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(occPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        // localCheckpoint: the read must not also be a lazy dependency
        // of the dynamic overwrite of the same root (admitStream)
        Some(spark.read.schema(occSchema).parquet(occPath)
          .filter(col("batch_id") < bid)
          .drop("batch_id").localCheckpoint())
      else None
    }
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val b = batch.select("doc_id", "text").localCheckpoint()
        val against = earlierOcc(bid)
          .map(corpusOcc.unionByName(_)).getOrElse(corpusOcc)
        val screened = graft.text.SubstringDedup
          .screenIncrement(against, b, maxCoverageBp)
          .localCheckpoint()
        graft.text.SubstringDedup.occurrencesOf(
            b.join(screened.filter(col("admit")).select("doc_id"), "doc_id"))
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(occPath)
        screened
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(flaggedPath)
      }
  }

  // ---- span-screen side-store lifecycle (r16 verdict #4 / ADVICE #3)
  // The cross-batch store grew one batch_id partition per micro-batch
  // forever: unbounded partition count = unbounded per-batch file
  // listing and localCheckpoint footprint at 100 TB. Two maintenance
  // ops close it, both with the single-maintainer / no-concurrent-
  // micro-batch contract (run them between batches or across a stream
  // restart, the IndexTables.maintain posture):
  //
  //  COMPACTION folds every partition EXCEPT the newest into ONE
  //  partition keyed at the largest folded batch_id. Correct under the
  //  replay discipline because Structured Streaming commits batches in
  //  order, so at most the NEWEST batch can ever replay: its read
  //  (batch_id < max) sees exactly the folded predecessors, and every
  //  future batch (bid > max) sees everything — "strictly earlier"
  //  semantics are preserved verbatim (IncrementalDedupSpec pins
  //  screened ≡ cumulative across a mid-stream compaction). The
  //  rewrite goes through a staging dir + [[graft.lake.Lake.swapInto]]
  //  so a crash leaves either the old store or recoverable aside dirs,
  //  never a half-folded read.
  //
  //  PROMOTION is the corpus-rebuild contract: when admitted docs are
  //  folded into the corpus itself (and its `ngo` occurrence table
  //  re-persisted), their side-store rows become pure REDUNDANCY —
  //  the screen's corpus hit is presence-based (distinct ngh, see
  //  screenIncrement), so flags don't change, but every future batch
  //  scans the same token-scale occurrence rows TWICE (corpus table +
  //  side store) and the store never shrinks even though the corpus
  //  absorbed its content. The orchestrator that rebuilt the corpus
  //  through batch `coveredUpTo` drops the covered partitions at the
  //  stream-restart boundary (spanScreenStream reads its corpus at
  //  stream start, so a corpus rebuild implies a restart; the new
  //  checkpoint's committed batches are all > coveredUpTo, so no
  //  covered batch can replay). Screened output is IDENTICAL before
  //  and after the promote (spec-pinned) — the op is a cost lifecycle,
  //  not a correctness patch.

  /** batch_id partition values present in a `batch_id=`-partitioned
    * store, ascending; empty when no store exists. One directory
    * listing — the same debt gauge as
    * [[graft.lake.IndexTables.filesPerBucket]].
    */
  def batchIdStoreParts(spark: SparkSession, storePath: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong).sorted
  }

  /** Fold all `batch_id=` partitions of `storePath` except the NEWEST
    * into one keyed at the largest folded batch id. Sound for every
    * store this module writes — side states read strictly earlier
    * (`batch_id < bid`: a future batch sees the fold as exactly its
    * predecessors) and output/delta stores whose consumers drop
    * batch_id (rows identical, only partition keys move) — because
    * Structured Streaming commits batches in order, so only the NEWEST
    * batch can ever replay, and its partition is left untouched for
    * the dynamic overwrite to hit. `schema` pins the read when given
    * (the span-screen store can be all-footer-less after a rejected-
    * only stream); inferred otherwise. Returns false when fewer than
    * 3 partitions exist (nothing worth folding). Run between
    * micro-batches only (single-maintainer, the IndexTables posture);
    * the rewrite goes through staging + [[graft.lake.Lake.swapInto]]
    * so a crash leaves the old store or recoverable aside dirs, never
    * a half-folded read. Empty (footer-less) partition dirs are
    * absorbed — their absence is observationally identical.
    */
  def compactBatchIdStore(spark: SparkSession, storePath: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Boolean = {
    val parts = batchIdStoreParts(spark, storePath)
    if (parts.size < 3) return false
    val keep = parts.max
    val foldKey = parts.filter(_ < keep).max
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    val rows =
      try reader.parquet(storePath)
      catch { case _: org.apache.spark.sql.AnalysisException => return false }
    val tmp = storePath.stripSuffix("/") + "_compacting"
    rows.withColumn("batch_id",
        when(col("batch_id") < keep, lit(foldKey)).otherwise(col("batch_id")))
      .write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    graft.lake.Lake.swapInto(spark, tmp, storePath)
    true
  }

  /** Partition-count trigger for [[compactBatchIdStore]] — mirrors
    * IndexTables.CompactionFilesPerBucket's calibration posture: the
    * per-batch bill is the probe-side file LISTING + read, near-linear
    * in partition count, and one compaction is a store-sized rewrite
    * amortized over the batches it absorbs.
    */
  val SpanScreenMaxParts = 8

  /** Compact `storePath` iff its partition debt exceeds `maxParts`. */
  def maintainBatchIdStore(spark: SparkSession, storePath: String,
      maxParts: Int = SpanScreenMaxParts,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Boolean =
    batchIdStoreParts(spark, storePath).size > maxParts &&
      compactBatchIdStore(spark, storePath, schema)

  private def spanScreenOccSchema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", org.apache.spark.sql.types.LongType)
    .add("s", org.apache.spark.sql.types.IntegerType)
    .add("ngh", org.apache.spark.sql.types.BinaryType)
    .add("batch_id", org.apache.spark.sql.types.LongType)

  /** The span-screen entry points over the generic lifecycle (the side
    * store lives at `<flaggedPath>_occ`; its schema is pinned — a
    * rejected-only stream leaves it all-footer-less).
    */
  def spanScreenStoreParts(spark: SparkSession,
      flaggedPath: String): Seq[Long] =
    batchIdStoreParts(spark, flaggedPath.stripSuffix("/") + "_occ")

  def maintainSpanScreenStore(spark: SparkSession, flaggedPath: String,
      maxParts: Int = SpanScreenMaxParts): Boolean =
    maintainBatchIdStore(spark, flaggedPath.stripSuffix("/") + "_occ",
      maxParts, Some(spanScreenOccSchema))

  def compactSpanScreenStore(spark: SparkSession,
      flaggedPath: String): Boolean =
    compactBatchIdStore(spark, flaggedPath.stripSuffix("/") + "_occ",
      Some(spanScreenOccSchema))

  /** Drop side-store partitions with batch_id ≤ `coveredUpTo` after the
    * corpus has been REBUILT to contain those batches' admitted docs —
    * their occurrence rows now live on the corpus (`ngo`) side, so the
    * covered partitions are redundant rows every future batch would
    * scan twice (see the lifecycle note above; flags are unchanged
    * either way — the screen's corpus hit is presence-based). Returns
    * the number of partitions dropped. Apply at the stream-restart
    * boundary only.
    */
  def promoteSpanScreenStore(spark: SparkSession, flaggedPath: String,
      coveredUpTo: Long): Int = {
    val occPath = flaggedPath.stripSuffix("/") + "_occ"
    val root = new org.apache.hadoop.fs.Path(occPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val covered = spanScreenStoreParts(spark, flaggedPath)
      .filter(_ <= coveredUpTo)
    covered.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"batch_id=$b"), true)
    }
    covered.size
  }

  /** Streaming DSIR admission (r17) — the importance-gating twin of
    * t43/t46 for a live ingest feed: each micro-batch of incoming
    * (doc_id, lang, text) docs is scored against the CORPUS's
    * per-feature ratio relation and admission-gated under t43's
    * content-keyed coin, via [[graft.text.Dsir.admitWith]] REUSED
    * VERBATIM — streamed and batch admission share one implementation
    * and cannot drift (DsirSpec pins streamed ≡ per-chunk
    * admitIncoming and the replay).
    *
    * Scale shape: the ratio relation is ≤ Dsir.Buckets rows — served
    * from the persisted `dsir` counts table when fresh (the 100 TB
    * default; the corpus-side aggregates are skipped entirely) —
    * localCheckpointed ONCE at stream start and broadcast into each
    * batch's scan-bound feature join; per-batch work is batch-sized.
    * CORPUS-FROZEN BY DESIGN: admission compares incoming docs to the
    * distribution the corpus was curated toward, so admitted docs do
    * NOT fold into the reference mixture mid-stream (the deliberate
    * opposite of spanScreenStream's cross-batch memory — a dup screen
    * must remember what it admitted; an importance gate that updated
    * its own reference would drift toward whatever it lets in). A
    * corpus rebuild picks up the new mixture at stream restart.
    * Output rows land in `batch_id=` partitions via dynamic overwrite
    * (idempotent replay, the module posture) and the store is
    * [[compactBatchIdStore]]-maintainable like every other.
    */
  def dsirAdmitStream(docs: DataFrame, corpusDir: String, outPath: String,
      checkpoint: String): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    val ratio = graft.text.Dsir.corpusRatios(spark, corpusDir)
      .localCheckpoint()
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        graft.text.Dsir.admitWith(ratio,
            batch.select("doc_id", "lang", "text").localCheckpoint())
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
      }
  }

  def admitStream(docs: DataFrame, corpus: DataFrame, admittedPath: String,
      checkpoint: String, minJaccard: Double = 0.8,
      corpusBands: Option[DataFrame] = None): DataStreamWriter[Row] = {
    import graft.text.Dedup
    val spark = corpus.sparkSession
    val corpusCols = corpus.columns.map(col).toIndexedSeq
    val staticBands = corpusBands.getOrElse(Dedup.bandIndex(corpus))
      .localCheckpoint()
    // EXCLUDES the replaying batch's own partition (a replayed batch
    // must not reject its docs as dups of its previous attempt), and
    // materializes via localCheckpoint so the subsequent dynamic
    // overwrite of the same root is not also a read of it. The read is
    // SCHEMA-PINNED: a batch that admits nothing still creates the
    // directory (with no parquet footers), and an inferring read of it
    // would throw 'Unable to infer schema' on every later batch — with
    // the schema supplied it is just an empty frame.
    val admittedSchema = corpus.schema
      .add("batch_id", org.apache.spark.sql.types.LongType)
    def admittedSoFar(bid: Long): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(admittedPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(spark.read.schema(admittedSchema).parquet(admittedPath)
          .filter(col("batch_id") =!= bid)
          .drop("batch_id").localCheckpoint())
      else None
    }
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val inc = batch.select(corpusCols: _*)
        val (against, bands) = admittedSoFar(bid) match {
          case Some(adm) =>
            (corpus.unionByName(adm),
              staticBands.unionByName(Dedup.bandIndex(adm)))
          case None => (corpus, staticBands)
        }
        Dedup.admitIncrement(against, inc, minJaccard,
            corpusBands = Some(bands))
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(admittedPath)
      }
  }

  /** One micro-batch of streaming JOIN-VIEW maintenance — the batch
    * body of [[joinViewStream]], exposed so a replayed batch can be
    * driven directly in tests (the idempotency contract is per-batch).
    *
    * The batch is a multiplexed CDC frame (`side` ∈ {a, b} + the union
    * of both relations' columns — the one-topic Debezium shape); the
    * view INCREMENT is the Blakeley delta rule minus its
    * history⋈history leg, obtained by two VERBATIM
    * [[graft.ops.Warehouse.deltaJoinView]] calls with empty legs:
    *   ΔA⋈B_old ∪ ΔA⋈ΔB  =  deltaJoinView(∅, ΔA, B_old, ΔB)
    *   A_old⋈ΔB          =  deltaJoinView(A_old, ∅, ∅, ΔB)
    * so streaming and nightly-batch maintenance share ONE join-algebra
    * implementation and cannot drift (the admitStream posture).
    *
    * Robustness (the admitStream set, strengthened): state reads are
    * SCHEMA-PINNED (an empty first batch leaves footer-less dirs) and
    * read STRICTLY EARLIER partitions only (`batch_id < bid`, not just
    * "≠ bid"): batch bid's output is then a pure function of its
    * predecessors, so a replay is bit-identical even if later batches
    * already committed (the ≠-only form recomputed a replayed batch
    * against FUTURE state and duplicated the later batches' view
    * rows — caught by the replay spec). The view increment and both
    * side-state deltas land in their own `batch_id=` partitions via
    * dynamic overwrite, so a replayed micro-batch overwrites itself at
    * every crash point.
    */
  def joinViewBatch(spark: SparkSession, statePath: String,
      viewPath: String, key: String, aCols: Seq[String],
      bCols: Seq[String])(batch: DataFrame, bid: Long): Unit = {
    import graft.ops.Warehouse.deltaJoinView
    val dA = batch.filter(col("side") === "a")
      .select((key +: aCols).map(col): _*).localCheckpoint()
    val dB = batch.filter(col("side") === "b")
      .select((key +: bCols).map(col): _*).localCheckpoint()
    def sideState(sub: String, like: DataFrame): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(s"$statePath/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read
          .schema(like.schema.add("batch_id",
            org.apache.spark.sql.types.LongType))
          .parquet(p.toString)
          .filter(col("batch_id") < bid).drop("batch_id").localCheckpoint()
      else like.limit(0)
    }
    val aOld = sideState("a", dA)
    val bOld = sideState("b", dB)
    val incr = deltaJoinView(dA.limit(0), dA, bOld, dB, key)
      .unionByName(deltaJoinView(aOld, dA.limit(0), bOld.limit(0), dB, key))
    incr.withColumn("batch_id", lit(bid))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(viewPath)
    Seq(("a", dA), ("b", dB)).foreach { case (sub, d) =>
      d.withColumn("batch_id", lit(bid))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(s"$statePath/$sub")
    }
  }

  /** Streaming twin of l7's incremental join-view maintenance
    * (r11 verdict stretch #9): a multiplexed CDC stream of ΔA/ΔB rows
    * maintains the materialized join at `viewPath` one micro-batch at
    * a time — the view over everything streamed so far always equals
    * the one-shot batch join (StreamingSpec pins the parity across
    * micro-batches and the per-batch replay idempotency). Steady-state
    * cost per batch is the three delta legs only: batch-sized against
    * state, never history⋈history.
    */
  def joinViewStream(updates: DataFrame, statePath: String,
      viewPath: String, checkpoint: String, key: String,
      aCols: Seq[String], bCols: Seq[String]): DataStreamWriter[Row] = {
    val spark = updates.sparkSession
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(
        joinViewBatch(spark, statePath, viewPath, key, aCols, bCols) _)
  }

  /** One adjacency micro-batch: the batch build
    * ([[graft.queries.Graph.coOrderWeightedFrom]]) runs VERBATIM on the
    * batch's lineitem rows and the delta lands in its own `batch_id=`
    * partition via dynamic overwrite — a replayed batch overwrites
    * itself, so recovery re-runs are bit-identical (the joinViewBatch
    * posture). Factored out so the replay spec can re-drive a batch
    * body directly.
    */
  private[graft] def adjacencyBatch(deltaPath: String)(
      batch: DataFrame, bid: Long): Unit =
    graft.queries.Graph.coOrderWeightedFrom(batch.localCheckpoint())
      .withColumn("batch_id", lit(bid))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(deltaPath)

  /** Streaming GRAPH maintenance (r12 verdict stretch #10) — the stream
    * twin of [[graft.queries.Graph.appendAdjacencyIncrement]]: a stream
    * of new orders' lineitem rows maintains the co-order adjacency one
    * micro-batch at a time, each batch contributing its delta edge
    * weights. The merged adjacency ([[streamedAdjacency]] — the same
    * per-key weight sum `coAdj` applies to an appended table) always
    * equals the one-shot batch build over everything streamed so far
    * (StreamingSpec pins the parity across micro-batches and per-batch
    * replay idempotency).
    *
    * Contracts (the appendAdjacencyIncrement grain): each micro-batch
    * carries WHOLE orders — co-order pairs are order-local, so an
    * order's lines must not straddle batches — and order keys are
    * disjoint across batches (new orders, the CDC shape). Steady-state
    * cost per batch is batch-sized only: the delta build never touches
    * prior batches' partitions.
    */
  def adjacencyStream(lineitems: DataFrame, deltaPath: String,
      checkpoint: String): DataStreamWriter[Row] =
    lineitems.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(adjacencyBatch(deltaPath) _)

  /** The maintained adjacency over the streamed delta store: per-key
    * weight merge, schema-pinned (an empty or footerless store must
    * read as zero edges, not throw — the admitEmbeddingStream lesson).
    */
  def streamedAdjacency(spark: SparkSession, deltaPath: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("batch_id",
        org.apache.spark.sql.types.LongType)))
    spark.read.schema(schema).parquet(deltaPath).drop("batch_id")
      .groupBy("u", "v").agg(sum("w").as("w"))
  }

  /** Streaming EMBEDDING admission — [[graft.sim.Similarity.admitEmbeddingIncrement]]
    * as a continuously-running gate, the vector twin of [[admitStream]]:
    * each micro-batch of (vec_id, embedding) candidates is
    * near-dup-checked by exact cosine (score-in-join through the LSH
    * bucket index) against the static curated corpus AND everything
    * admitted in earlier batches, then appended to the admitted store.
    * The batch-side admission logic is reused verbatim (foreachBatch),
    * so streaming and nightly-batch admission cannot drift.
    *
    * Scale/robustness contracts (the [[admitStream]] set):
    *   - The HASH FAMILY is sized by the static corpus ONCE
    *     (`familyN` = corpus count at build) and every later frame —
    *     increments, the admitted store — hashes with that family; a
    *     per-batch re-size would silently probe the wrong buckets.
    *   - The corpus bucket index is computed once and reused every
    *     batch (pass a persisted [[graft.sim.Similarity.embeddingBucketIndex]]
    *     via `corpusIndex` to skip even that); only the (small)
    *     admitted-so-far store re-indexes per batch.
    *   - Batch writes are IDEMPOTENT: each batch lands in its own
    *     `batch_id=` partition via dynamic partition overwrite; a
    *     replayed micro-batch overwrites itself, and the
    *     admitted-so-far probe EXCLUDES the replaying batch's own
    *     partition (a replay must not reject its vectors as dups of
    *     its previous attempt). The read is SCHEMA-PINNED: an
    *     all-rejected batch leaves a footerless directory an
    *     inferring read would throw on.
    *   - Cross-batch duplicates are rejected because the admitted
    *     store is probed alongside the corpus.
    */
  def admitEmbeddingStream(vectors: DataFrame, corpus: DataFrame,
      admittedPath: String, checkpoint: String, familyN: Long,
      minCosine: Double = 0.30,
      corpusIndex: Option[DataFrame] = None): DataStreamWriter[Row] = {
    import graft.sim.Similarity
    val spark = corpus.sparkSession
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val corpusNormed = Similarity.withNorm(corpus)
    val staticIndex = corpusIndex
      .getOrElse(Similarity.embeddingBucketIndex(corpusNormed, familyN))
      .localCheckpoint()
    val admittedSchema = corpus.schema
      .add("batch_id", org.apache.spark.sql.types.LongType)
    def admittedSoFar(bid: Long): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(admittedPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(spark.read.schema(admittedSchema).parquet(admittedPath)
          .filter(col("batch_id") =!= bid)
          .drop("batch_id").localCheckpoint())
      else None
    }
    val corpusCols = corpus.columns.map(col).toIndexedSeq
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val inc = Similarity.withNorm(batch.select(corpusCols: _*))
        val (against, index) = admittedSoFar(bid) match {
          case Some(adm) =>
            val admNormed = Similarity.withNorm(adm)
            (corpusNormed.unionByName(admNormed),
              staticIndex.unionByName(
                Similarity.embeddingBucketIndex(admNormed, familyN)))
          case None => (corpusNormed, staticIndex)
        }
        val admitted = Similarity.admitEmbeddingIncrement(
          against, inc, familyN, minCosine, corpusIndex = Some(index))
        batch.select(corpusCols: _*)
          .join(admitted.select("vec_id"), Seq("vec_id"), "left_semi")
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(admittedPath)
      }
  }

  /** Stream-stream enrichment join (§2.9 extension): ticks joined to a
    * second stream of reference updates (the streaming twin of j1's
    * dim join — e.g. enriching a Firehose tick stream with a
    * slowly-updating quote/rate stream). Both sides carry watermarks
    * and the join condition bounds the event-time distance, so Spark
    * can evict buffered rows once the watermark passes the bound —
    * state is O(rows within the interval), independent of stream
    * length. An unbounded-condition stream-stream join would buffer
    * both streams forever; Spark rejects it in append mode, and this
    * API makes the bound explicit.
    *
    * Inner join: a tick emits when (and only when) a reference row for
    * its key exists within `maxDelay` BEFORE the tick. MULTI-MATCH
    * FAN-OUT: this is a relational join, so a tick whose interval
    * covers N reference updates emits N rows — one per matching ref —
    * not one row with "the latest". That shape is what a training-data
    * pipeline usually wants anyway (every applicable rate revision,
    * immediately, per micro-batch); when the contract really is
    * one-row-per-tick, use [[enrichStreamLatest]], and pay its
    * watermark-delayed emission.
    */
  def enrichStream(ticks: DataFrame, refs: DataFrame, key: String,
      tickTs: String, refTs: String,
      lateness: String = "10 minutes",
      maxDelay: String = "1 hour"): DataFrame = {
    val t = ticks.withWatermark(tickTs, lateness)
    val r = refs.withWatermark(refTs, lateness)
    t.join(r,
      t(key) === r(key) &&
        r(refTs) <= t(tickTs) &&
        r(refTs) >= t(tickTs) - expr(s"INTERVAL $maxDelay"))
      .drop(r(key))
  }

  /** [[enrichStream]] reduced to ONE output row per tick: the reference
    * row with the greatest `refTs` within the interval wins (`max_by`
    * over a struct of the ref columns). Chained stateful operators —
    * interval join, then an append-mode aggregation grouped on the
    * tick's columns (including its watermarked event-time column) — so
    * a tick's row emits only once the watermark passes its event time:
    * latency ≥ `lateness`, the price of knowing no later in-interval
    * ref can still arrive. State stays bounded on both operators (the
    * join evicts by interval, the agg by watermark). Requires tick and
    * ref column names to be disjoint apart from `key`, and tick rows
    * to be unique (duplicate identical ticks collapse into one group).
    */
  def enrichStreamLatest(ticks: DataFrame, refs: DataFrame, key: String,
      tickTs: String, refTs: String,
      lateness: String = "10 minutes",
      maxDelay: String = "1 hour"): DataFrame = {
    val joined = enrichStream(ticks, refs, key, tickTs, refTs, lateness, maxDelay)
    val tickCols = ticks.columns.toSeq
    val refCols = refs.columns.toSeq.filterNot(_ == key)
    joined
      .groupBy(tickCols.map(col): _*)
      .agg(max_by(struct(refCols.map(col): _*), col(refTs)).as("_latest"))
      .select(tickCols.map(col) ++
        refCols.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** Streaming exact dedup (§2.9 × the dedup layer): the streaming twin
    * of [[graft.text.Dedup.dropExactDuplicates]] — a training-data
    * ingest stream dropping records already seen by key.
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: on a stream
    * the plain form keeps every key's state FOREVER (unbounded at
    * 100 TB/day); the watermarked form evicts state once event time
    * passes lateness, so state is O(keys per watermark window) — the
    * dedup guarantee holds for duplicates arriving within `lateness` of
    * each other, which is the deliverable contract of at-least-once
    * upstream delivery (Firehose/SQS redelivery windows are minutes,
    * not days).
    */
  def dedupStream(df: DataFrame, keys: Seq[String], tsCol: String,
      lateness: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Custom streaming state (§2.9 extension, brief:
    * `KeyValueGroupedDataset.mapGroupsWithState` for state the built-in
    * windows can't express): cumulative per-key stats that survive
    * across micro-batches. State lives in the state store (checkpoint),
    * sized O(distinct keys) — at 100 TB/day stream volume that's the
    * bound that matters, not stream length. Output mode: Update.
    */
  def runningUserStats(
      ticks: org.apache.spark.sql.Dataset[(String, Double)])
      : org.apache.spark.sql.Dataset[(String, Long, Double)] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_._1)
      .mapGroupsWithState(
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[(String, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          var (c, t) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => c += 1; t += r._2 }
          state.update((c, t))
          (user, c, math.round(t * 100) / 100.0)
      }
  }

  /** Streaming twin of the batch latest-per-key compaction
    * ([[graft.queries.CoreQueries.o7LatestPerKey]]): maintain the
    * CURRENT row per key as the stream flows — the continuously-
    * materialized CDC view. State is one (ts, seq, value) per key —
    * O(distinct keys), independent of stream length — and an arriving
    * row replaces it only if strictly later by the (ts, seq) total
    * order, so late/out-of-order events can never regress the view
    * (same determinism contract as o7's (ts, event_id) struct; `seq`
    * disambiguates equal timestamps). Output mode: Update — each
    * micro-batch re-emits the current row for every touched key.
    */
  def latestPerKeyStream(
      rows: org.apache.spark.sql.Dataset[(String, Long, Long, Double)])
      : org.apache.spark.sql.Dataset[(String, Long, Long, Double)] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState(
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Double)]) =>
          var best = state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0.0))
          it.foreach { r =>
            if (r._2 > best._1 || (r._2 == best._1 && r._3 > best._2))
              best = (r._2, r._3, r._4)
          }
          state.update(best)
          (key, best._1, best._2, best._3)
      }
  }

  /** Per-key admission QUOTA on a stream: pass each key's rows through
    * until its running total hits `quota`, drop the rest — the
    * streaming form of [[graft.ops.Sampling.capPerKey]]'s domain
    * balancing (a crawl frontier or event firehose where one hot
    * domain/user must not flood the corpus). flatMapGroupsWithState:
    * state is ONE counter per key — O(distinct keys), independent of
    * stream length — and emission happens inline, so under-quota rows
    * flow through in the same micro-batch. Admission is deterministic
    * in arrival order WITHIN the stream's per-key order (a quota is an
    * arrival-policy by definition — re-runs over the same checkpointed
    * batches admit identical rows; there is no content coin to make
    * reordered deliveries agree, which is exactly why the BATCH form
    * uses one and this form is the online complement).
    */
  def quotaPerKeyStream(
      rows: org.apache.spark.sql.Dataset[(String, Long)], quota: Long)
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    require(quota > 0, s"quota must be positive: $quota")
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val admitted = it.filter { _ =>
            if (used < quota) { used += 1; true } else false
          }.toVector
          state.update(used)
          admitted.iterator
      }
  }

  /** Streaming sessionization via flatMapGroupsWithState — the brief's
    * named API for custom state, where the built-in session_window can't
    * express the output contract (emit ONE closed-session row per
    * session, only when the event-time watermark proves it over).
    *
    * State: per-user open session; timeout: event time of the last
    * event + `gapSeconds`. When the watermark passes that, the session
    * closes, emits, and its state is dropped — so state size is
    * O(users with an open session), not O(stream length).
    */
  def sessionizeStream(
      events: org.apache.spark.sql.Dataset[SessionEvent],
      gapSeconds: Long = 1800,
      lateness: String = "10 minutes")
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        (user: String, rows: Iterator[SessionEvent],
         state: org.apache.spark.sql.streaming.GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.n, s.total,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs)))
          } else {
            val buf = rows.toSeq
            val prev = state.getOption.getOrElse(OpenSession(0L, 0.0,
              Long.MaxValue, Long.MinValue))
            val next = buf.foldLeft(prev) { (acc, e) =>
              OpenSession(acc.n + 1, acc.total + e.value,
                math.min(acc.startMs, e.ts.getTime),
                math.max(acc.lastMs, e.ts.getTime))
            }
            state.update(next)
            state.setTimeoutTimestamp(next.lastMs + gapSeconds * 1000)
            Iterator.empty
          }
      }
  }

  final case class SessionEvent(user: String, ts: java.sql.Timestamp,
      value: Double)
  final case class OpenSession(n: Long, total: Double, startMs: Long,
      lastMs: Long)
  final case class ClosedSession(user: String, n_events: Long,
      total: Double, start: java.sql.Timestamp, end: java.sql.Timestamp)

  /** Streaming heavy hitters with BOUNDED state: `shards` parallel
    * Misra-Gries sketches maintained by the vanilla streaming-agg state
    * store — no custom state code, the batch
    * [[graft.functions.FreqSketchAggregator]] IS the streaming one
    * (its buffer is the per-group aggregation state; mergeability is
    * exactly what the PODS '12 merge provides).
    *
    * Why not `groupBy(key).count()`: its state grows with the DISTINCT
    * key domain — unbounded on a web-scale token stream. Here state is
    * ≤ `shards` rows of ≤ k counters each, independent of stream
    * length and key cardinality.
    *
    * Guarantee carried to the stream: every occurrence of a key hashes
    * to the SAME shard, so a key with global count > N/(k+1) has shard
    * count > n_shard/(k+1) (n_shard ≤ N) and is guaranteed present in
    * that shard's candidate list — the union over shards is a complete
    * candidate superset at every micro-batch (no false negatives above
    * threshold; false positives possible, the t8 two-pass recount is
    * the exact-ifier).
    *
    * Run with output mode Update (emits changed shards per batch) or
    * Complete. Sharding by `pmod(xxhash64(key), shards)` also spreads
    * the sketch-merge work across tasks — a single global sketch would
    * serialize the whole stream through one state row.
    */
  def frequentStream(keys: org.apache.spark.sql.Dataset[String],
      k: Int = 1000, shards: Int = 8)
      : DataFrame = {
    import keys.sparkSession.implicits._
    require(k > 0 && shards > 0)
    val sketch = new graft.functions.FreqSketchAggregator(k).toColumn
    keys
      .groupByKey(key => math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(key), shards))
      .agg(sketch.name("cands"))
      .toDF("shard", "cands")
  }

  /** T4: status polling (`describe_delivery_stream until ACTIVE`,
    * create_firehose_stream.py:51-67). Blocks until the query has
    * processed all currently-available input or `timeoutMs` elapses —
    * returns false on expiry. `processAllAvailable` itself blocks
    * unboundedly (a hung/slow-trigger query never returns), so it runs
    * on a bounded-join daemon thread. ONE poller per query id (r3
    * review): polling a stuck query in a loop re-joins the same parked
    * thread instead of accumulating one blocked thread per call —
    * sound, because processAllAvailable keeps re-checking for new input
    * until it returns, so an in-flight poll covers everything available
    * at any later join too.
    */
  def awaitProcessed(q: StreamingQuery, timeoutMs: Long = 60000): Boolean = {
    if (!q.isActive) return true
    val entry = pollers.compute(q.id, (_, existing) => {
      if (existing != null && existing._1.isAlive) existing
      else {
        val done = new java.util.concurrent.atomic.AtomicBoolean(false)
        val t = new Thread(() => {
          try { q.processAllAvailable(); done.set(true) }
          catch { case _: Throwable => () }
          finally { pollers.remove(q.id) }
        }, s"graft-awaitProcessed-${q.id}")
        t.setDaemon(true)
        t.start()
        (t, done)
      }
    })
    entry._1.join(timeoutMs)
    entry._2.get() || !q.isActive
  }

  private val pollers = new java.util.concurrent.ConcurrentHashMap[
    java.util.UUID,
    (Thread, java.util.concurrent.atomic.AtomicBoolean)]()

  /** One-line status snapshot (T4's poll body). */
  def statusOf(q: StreamingQuery): String =
    s"${q.name}: active=${q.isActive} ${q.status.message}"
}
