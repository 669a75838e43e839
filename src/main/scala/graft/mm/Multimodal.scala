package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables._
import graft.functions.Hashing

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode/feature-extract run per-partition in batches.
  *
  * The image/audio codecs are NOT in this environment, so the decode
  * kernel is a clearly-marked deterministic STUB ([[decodeFrameStub]]);
  * everything around it — the binary column handling, the schema, the
  * typed Dataset boundary, the partitioning, the batched mapPartitions
  * shape — is the real plumbing a production decode would drop into.
  *
  * Scale notes (100 TB of media): payloads stay opaque bytes end-to-end
  * (no base64 round-trips); metadata projections (mm1/mm2) are narrow
  * and scan-bound; the decode stage (mm3) repartitions by media id so
  * one partition holds whole media items — the unit a GPU/codec batch
  * wants — and emits rows, never collecting to the driver.
  */
object Multimodal {

  /** The media table: documents' text bytes stand in for image/audio
    * payloads (same opaque-binary handling, zero-copy at rest since
    * parquet stores BYTE_ARRAY either way).
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))

  /** mm1: payload metadata + stub-decoded dimensions. The "decode" that
    * yields width/height is the deterministic stand-in for an image
    * header parse — derived from the payload hash so both engines (and
    * reruns) agree.
    */
  def mm1MediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .withColumn("h", Hashing.h32(col("payload").cast("string")))
      .select(
        col("media_id"),
        length(col("payload")).as("n_bytes"),
        (lit(64) + pmod(col("h"), lit(448))).cast("int").as("width"),
        (lit(64) + pmod(expr("h div 448"), lit(448))).cast("int").as("height"))
      .orderBy("media_id")

  /** mm2 vectors: stub feature extraction — an 8-dim hash-derived vector
    * per payload, the shape a real embedding model would emit. Output
    * plugs straight into [[graft.sim.Similarity]]'s ANN path.
    */
  def mm2FeatureVectors(s: SparkSession, d: String): DataFrame = {
    val h = Hashing.h32Sql("concat(cast(payload as string), '#', cast(i as string))")
    mediaTable(s, d)
      .select(col("media_id"),
        // explicit double casts: a bare 1000.0 literal is DECIMAL in
        // both engines' SQL and decimal division would leak into the type
        expr(s"transform(sequence(0, 7), i -> cast($h % 1000 as double) / cast(1000 as double))")
          .as("feat"))
  }

  /** mm2 query: the feature vectors exploded to scalar (media_id, i, val)
    * rows. The value surface must hold only hashable scalars (an
    * `array<double>` column crashes the driver's pandas sort, r2 verdict
    * #1); [[mm2FeatureVectors]] keeps the array shape for the ANN path.
    */
  def mm2FakeFeatures(s: SparkSession, d: String): DataFrame =
    mm2FeatureVectors(s, d)
      .select(col("media_id"), posexplode(col("feat")).as(Seq("i", "val")))
      .select(col("media_id"), col("i").cast("long").as("i"), col("val"))
      .orderBy("media_id", "i")

  final case class Media(media_id: Long, payload: Array[Byte])
  final case class Frame(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** STUB decode kernel — stands in for an image/video codec. Real
    * implementation would decode `payload` and emit one row per sampled
    * frame; the stub derives a deterministic per-frame hash from the
    * bytes so the plumbing is testable.
    */
  def decodeFrameStub(m: Media, idx: Int): Frame = {
    var h = 1125899906842597L
    var i = idx
    val step = math.max(1, m.payload.length / 16)
    while (i < m.payload.length) { h = 31 * h + m.payload(i); i += step }
    Frame(m.media_id, idx, h)
  }

  /** mm3: batched frame sampling via a typed mapPartitions — the
    * Spark-native equivalent of a `mapInPandas` decode stage. Every
    * partition processes its media items as one batch (where a codec
    * would amortize init/GPU transfer); `framesPer` frames per item.
    */
  def mm3FrameSample(s: SparkSession, d: String, framesPer: Int = 4,
      parallelism: Int = 32): Dataset[Frame] = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("media_id"), col("payload"))
      .as[Media]
      // co-locate whole media items; the decode batch unit
      .repartition(parallelism, col("media_id"))
      .mapPartitions { batch =>
        batch.flatMap(m => (0 until framesPer).iterator
          .map(i => decodeFrameStub(m, i)))
      }
  }

  /** Query form of mm3 — oracle-checked since r4: the stub's strided
    * 31-polynomial IS expressible in DuckDB (verdict #8 stretch). The
    * SQL walks the same byte positions (`range(idx, len, step)`) and
    * folds the same update, with 64-bit wraparound emulated in HUGEINT
    * (`% 2^64`, signed-mapped at the end) because DuckDB's BIGINT
    * arithmetic errors on overflow instead of wrapping. Byte == ord of
    * the char at the same index holds because the corpus is ASCII
    * (payload is UTF-8 of text; asserted in MultimodalSpec).
    */
  def mm3Query(s: SparkSession, d: String): DataFrame =
    mm3FrameSample(s, d).toDF().orderBy("media_id", "frame_idx")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_meta"    -> (mm1MediaMeta _),
    "mm2_fake_features" -> (mm2FakeFeatures _),
    "mm3_frame_sample"  -> (mm3Query _),
  )

  def oracles: Map[String, String] = Map(
    "mm3_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |         octet_length(encode(text)) AS len
        |  FROM documents),
        |f AS (
        |  SELECT media_id, text, len, greatest(1, len // 16) AS step
        |  FROM m),
        |fr AS (
        |  SELECT media_id, text, len, step, CAST(t.i AS INTEGER) AS frame_idx
        |  FROM f, range(4) t(i)),
        |h AS (
        |  SELECT media_id, frame_idx,
        |    list_reduce(
        |      list_prepend(1125899906842597::HUGEINT,
        |        list_transform(range(frame_idx, len, step),
        |                       p -> ord(substr(text, p + 1, 1))::HUGEINT)),
        |      (acc, b) -> (31 * acc + b) % 18446744073709551616::HUGEINT) AS hu
        |  FROM fr)
        |SELECT media_id, frame_idx,
        |  CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |            THEN hu - 18446744073709551616::HUGEINT
        |            ELSE hu END AS BIGINT) AS frame_hash
        |FROM h
        |ORDER BY media_id, frame_idx""".stripMargin,
    "mm1_media_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         |  CAST(64 + (h % 448) AS INTEGER) AS width,
         |  CAST(64 + ((h // 448) % 448) AS INTEGER) AS height
         |FROM (SELECT doc_id, text, ${Hashing.h32Duck("text")} AS h
         |      FROM documents)
         |ORDER BY media_id""".stripMargin,
    "mm2_fake_features" ->
      s"""SELECT doc_id AS media_id, CAST(i AS BIGINT) AS i,
         |  CAST(${Hashing.h32Duck("text || '#' || CAST(i AS VARCHAR)")} % 1000
         |    AS DOUBLE) / CAST(1000 AS DOUBLE) AS val
         |FROM documents, range(8) t(i)
         |ORDER BY media_id, i""".stripMargin,
  )
}
