package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables._
import graft.functions.Hashing

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * the pretraining-mix curation move the sampling family
  * (t9/t12/t16/t22) lacks: instead of stratified rates chosen by hand,
  * each raw-pool document is weighted by how much its hashed-ngram
  * feature profile resembles a TARGET corpus, and survives a
  * resampling coin proportional to that weight. The reference pipeline
  * has no counterpart; features here are hashed word BIGRAMS (the
  * paper's hashed n-grams at the scale the synthetic docs support),
  * bucketed to [[Buckets]] ids with the portable md5 h32 so the
  * DuckDB oracle derives identical features.
  *
  * INTEGER-SURROGATE HONESTY: the paper's weight is
  * exp Σ_f c_f·log(p_T(f)/p_R(f)) — a product of rate ratios. Logs
  * and float products are not bit-stable across engines (the t32/t39
  * precedent: mean p_ppm instead of perplexity), so the score here is
  * the integer MEAN of per-feature smoothed rate ratios in ppm:
  * monotone in every feature's ratio, identical in both engines, and
  * sufficient for the resampling coin, which only needs a relative
  * score. Production runs that want the exact log-domain estimator
  * can post-map the persisted per-feature table — the expensive part
  * (the two count aggregates) is shared.
  *
  * Scale shape (100 TB): both corpus sides aggregate onto the
  * BUCKET-BOUNDED feature domain (≤ [[Buckets]] rows — partial-agg
  * shuffles of a fixed-size relation), the joined ratio table
  * broadcasts back into the raw-side feature stream (scan-bound
  * explode, no corpus shuffle except the final doc-grain aggregate),
  * and the resampling coin is a content-keyed hash — no RNG state, no
  * driver loop, deterministic under retries and repartitioning.
  *
  * Overflow bound, stated: the ratio numerator
  * (ct+1)·(rawTotal+B)·10⁶ must fit int64 — true while
  * target-feature counts × raw totals stay under ~9·10¹² (any test
  * tier by orders of magnitude). A corpus near the bound switches the
  * arithmetic to DecimalType(38,0)/HUGEINT — exact in both engines —
  * at the same query shape.
  */
object Dsir {

  /** Feature-hash buckets (the paper uses 10⁴; 2¹³ keeps the bucket
    * table trivially broadcastable while leaving the synthetic
    * corpus' ~60-word vocabulary far from saturating it).
    */
  val Buckets = 8192

  /** The "quality corpus" split standing in for the paper's target
    * distribution: the English documents; the raw pool is the rest.
    */
  val TargetLang = "en"

  /** Hashed-bigram features: (doc_id, f). Lowercased-bigram grain
    * shared with the LM family ([[TextAnalysis.docBigrams]]); docs
    * with < 2 tokens contribute nothing (no bigram exists).
    */
  private[graft] def features(docs: DataFrame): DataFrame =
    TextAnalysis.docBigrams(docs)
      .select(col("doc_id"),
        pmod(Hashing.h32(concat(col("w1"), lit(" "), col("w2"))),
          lit(Buckets.toLong)).as("f"))

  /** Per-feature smoothed rate ratio in ppm:
    * floor(10⁶ · ((ct+1)/(tt+B)) / ((cr+1)/(rt+B))) computed in pure
    * int64 (see the overflow bound above). Add-one smoothing keeps
    * never-seen-in-target features at a small positive score instead
    * of zeroing whole documents. ≤ [[Buckets]] rows — the broadcast
    * side of the scoring join.
    */
  def featureRatios(target: DataFrame, raw: DataFrame): DataFrame = {
    val tf = features(target).groupBy("f").agg(count(lit(1)).as("ct"))
    val rf = features(raw).groupBy("f").agg(count(lit(1)).as("cr"))
    val tot = tf.agg(sum("ct").as("tt")).crossJoin(rf.agg(sum("cr").as("rt")))
    tf.join(rf, Seq("f"), "full_outer")
      .crossJoin(broadcast(tot))
      .select(col("f"),
        expr(s"""((coalesce(ct, 0L) + 1L) * (rt + ${Buckets}L) * 1000000L)
                | div ((coalesce(cr, 0L) + 1L) * (tt + ${Buckets}L))"""
          .stripMargin.replace("\n", " ")).as("r_ppm"))
  }

  /** Per-raw-doc importance score: (doc_id, n_feats, score_ppm) with
    * score_ppm the integer mean of the doc's feature ratios — ≥ 10⁶
    * means "more target-like than the raw pool average".
    */
  private def weights(docs: DataFrame): DataFrame = {
    val target = docs.filter(col("lang") === TargetLang)
    val raw = docs.filter(col("lang") =!= TargetLang)
    features(raw)
      .join(broadcast(featureRatios(target, raw)), "f")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("r_ppm").as("sr"))
      .select(col("doc_id"), col("n_feats"),
        expr("sr div n_feats").as("score_ppm"))
  }

  /** t42: the importance weights, auditable per doc. */
  def t42DsirWeights(s: SparkSession, d: String): DataFrame =
    weights(documents(s, d)).orderBy("doc_id")

  /** t43: the resample — keep a raw-pool doc iff its content-keyed
    * coin (h60(text) mod 10⁶) lands under min(score_ppm, 10⁶):
    * keep-probability proportional to the importance weight, capped
    * at 1, deterministic across runs/engines/partitionings.
    */
  def t43DsirResample(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    docs.filter(col("lang") =!= TargetLang)
      .join(weights(docs), "doc_id")
      .filter(pmod(expr(Hashing.h60Sql("text")), lit(1000000L)) <
        least(col("score_ppm"), lit(1000000L)))
      .select(col("doc_id"), col("n_feats"), col("score_ppm"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t42_dsir_weights" -> (t42DsirWeights _),
    "t43_dsir_resample" -> (t43DsirResample _)
  )

  private def weightsSql: String =
    s"""tok AS (
       |  SELECT doc_id, lang,
       |    unnest(range(len(t))) AS p, unnest(t) AS tok
       |  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS t
       |        FROM documents)),
       |bg AS (
       |  SELECT doc_id, lang, tok AS w1,
       |    lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS w2
       |  FROM tok QUALIFY w2 IS NOT NULL),
       |feat AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substr(md5(w1 || ' ' || w2), 1, 8) AS BIGINT)
       |      % $Buckets AS f
       |  FROM bg),
       |tf AS (SELECT f, count(*) AS ct FROM feat
       |       WHERE lang = '$TargetLang' GROUP BY f),
       |rf AS (SELECT f, count(*) AS cr FROM feat
       |       WHERE lang <> '$TargetLang' GROUP BY f),
       |ratio AS (
       |  SELECT coalesce(tf.f, rf.f) AS f,
       |    ((coalesce(ct, 0) + 1) *
       |     ((SELECT sum(cr) FROM rf) + $Buckets) * 1000000)
       |    // ((coalesce(cr, 0) + 1) *
       |        ((SELECT sum(ct) FROM tf) + $Buckets)) AS r_ppm
       |  FROM tf FULL JOIN rf ON tf.f = rf.f),
       |w AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(r_ppm) // count(*) AS BIGINT) AS score_ppm
       |  FROM feat JOIN ratio USING (f)
       |  WHERE lang <> '$TargetLang'
       |  GROUP BY doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(
    "t42_dsir_weights" ->
      s"""WITH $weightsSql
         |SELECT doc_id, n_feats, score_ppm FROM w ORDER BY doc_id""".stripMargin,
    "t43_dsir_resample" ->
      s"""WITH $weightsSql
         |SELECT w.doc_id, w.n_feats, w.score_ppm
         |FROM w JOIN documents d ON w.doc_id = d.doc_id
         |WHERE CAST('0x' || substr(md5(d.text), 1, 15) AS BIGINT) % 1000000
         |      < least(w.score_ppm, 1000000)
         |ORDER BY w.doc_id""".stripMargin
  )
}
