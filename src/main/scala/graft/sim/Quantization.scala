package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.lake.Tables._

/** Int8 embedding quantization — the standard shuffle-bytes lever for
  * similarity search at corpus scale. A 64-dim float32 embedding is
  * 256 payload bytes; its symmetric-int8 form (`array<tinyint>` +
  * one float scale) is ~68 — Tungsten stores tinyint array elements in
  * 1 byte vs 4, so every exchange/broadcast/spill that carries vectors
  * shrinks ~4×. The cost is bounded: per-element error ≤ scale/2 =
  * maxAbs/254, which perturbs cosines by well under 1% — the two-stage
  * search below recovers even that.
  *
  * Production shape (`quantizedTopK`): stage 1 scores QUANTIZED vectors
  * (approx cosine = dot(q̂ₐ, q̂ᵦ)·sₐ·sᵦ / (‖a‖‖b‖), computed by the same
  * codegen'd `graft_dot`, which accepts array<tinyint>) and keeps a
  * small over-fetched candidate set per query; stage 2 re-scores ONLY
  * those candidates with the full float vectors. At 100 TB the float
  * corpus is touched once per surviving candidate instead of once per
  * comparison — the wide data stays out of the hot joins entirely.
  *
  * Quantization is build-time, once per corpus (the interpreted HOF
  * cost is irrelevant there); scoring is the hot path and stays in
  * whole-stage codegen. Like `Hashing.xxFamily` this is a production
  * path with sbt-pinned quality (recall floor vs the exact baseline in
  * LlmPipelineSpec), not an oracle query: round()'s half-tie behavior
  * inside the quantizer is engine-private.
  */
object Quantization {

  /** Adds `qvec array<tinyint>` and `qscale double`:
    * qscale = maxAbs/127, qvec_i = round(v_i / qscale). Zero vectors
    * get scale 1e-9 to avoid division by zero (they quantize to zeros).
    */
  def quantizeInt8(e: DataFrame, vecCol: String = "embedding"): DataFrame =
    e.withColumn("qscale",
        expr(s"greatest(array_max(transform($vecCol, x -> abs(x))), 1e-9F)" +
          " / cast(127 as double)"))
      .withColumn("qvec",
        expr(s"transform($vecCol, x -> cast(round(x / qscale) as tinyint))"))

  /** Two-stage top-k: quantized scoring over-fetches `fetch`
    * candidates per query, exact float re-rank keeps `k`.
    */
  def quantizedTopK(s: SparkSession, d: String, k: Int = 5,
      fetch: Int = 15): DataFrame = {
    VectorExpressions.ensureRegistered(s)
    val e = quantizeInt8(embeddings(s, d))
      .withColumn("nrm", expr("sqrt(graft_dot(embedding, embedding))"))
    // stage 1: narrow quantized index — ids, int8 vectors, scales, norms
    val idx = e.select(col("vec_id"), col("qvec"), col("qscale"), col("nrm"))
    val q = idx.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_qv"),
        col("qscale").as("q_s"), col("nrm").as("q_n"))
    val approx = q.crossJoin(idx.select(col("vec_id").as("n_id"),
        col("qvec").as("n_qv"), col("qscale").as("n_s"), col("nrm").as("n_n")))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_q",
        expr("graft_dot(q_qv, n_qv)") * col("q_s") * col("n_s") /
          (col("q_n") * col("n_n")))
    val wq = Window.partitionBy("q_id").orderBy(desc("cos_q"), asc("n_id"))
    val cand = approx
      .withColumn("rq", row_number().over(wq))
      .filter(col("rq") <= fetch)
      .select("q_id", "n_id")
    // stage 2: exact re-rank of the small candidate set on full floats
    val full = e.select(col("vec_id"), col("embedding"), col("nrm"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_exact"), asc("n_id"))
    cand
      .join(full.as("eq"), col("q_id") === col("eq.vec_id"))
      .join(full.as("en"), col("n_id") === col("en.vec_id"))
      .withColumn("cos_exact",
        expr("graft_dot(eq.embedding, en.embedding)") /
          (col("eq.nrm") * col("en.nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"),
        round(col("cos_exact"), 4).as("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }
}
