package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables._

/** Composed training-data prep pipeline — the operators working
  * together the way a real corpus build runs them:
  *
  *   quality filter → exact dedup → near-dup removal → corpus stats
  *
  * One declarative plan end-to-end: Catalyst sees the whole chain, so
  * the quality filter prunes rows BEFORE any dedup hashing, the exact
  * dedup halves the LSH input, and nothing materializes in between.
  * That ordering is the at-scale playbook: cheapest filter first, each
  * stage shrinks the next stage's input.
  */
object Pipelines {

  /** t4's quality score (floor'd basis points, see TextAnalysis). */
  private val qualityBpSql =
    """floor((least(cast(n_chars as double) / 500.0, 1.0) * 0.5 +
      |  (1.0 - cast(size(filter(split(text, ' '),
      |             x -> x IN ('the', 'a', 'of', 'and', 'in'))) as double)
      |     / size(split(text, ' '))) * 0.5) * 10000.0)""".stripMargin

  /** Keep docs with quality ≥ 0.65, drop exact then near duplicates,
    * report surviving docs per language.
    */
  def pipeDocsPrep(s: SparkSession, d: String): DataFrame = {
    val quality = documents(s, d).filter(expr(s"$qualityBpSql >= 6500"))
    val exact = Dedup.dropExactDuplicates(quality)
    val clean = Dedup.dropNearDuplicates(exact, minJaccard = 0.8)
    clean.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }

  /** The round-4 curation chain: quality filter → exact dedup →
    * stratified downsample → sequence packing, ONE declarative plan.
    * Stage order is the at-scale playbook again — the scan-bound
    * quality filter and the keyed sample both prune before the dedup
    * shuffle... except the sample must run AFTER dedup (sampling first
    * could keep a duplicate whose lower-id twin was sampled out,
    * changing which survivor dedup picks — order matters and is part
    * of the pipeline's contract). Packing runs last over exactly the
    * surviving docs. Every stage is deterministic, so the whole chain
    * is oracle-checked end-to-end.
    */
  def pipeCuratePack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = documents(s, d).filter(expr(s"$qualityBpSql >= 6500"))
    val exact = Dedup.dropExactDuplicates(quality)
    val sampled = graft.ops.Sampling.stratified(
      exact, col("lang"), col("doc_id"),
      rates = Map("en" -> 0.5), defaultRate = 0.9, salt = "cur")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    sampled
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("tok_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr("tok_before div 2048L").as("pack_id"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_docs_prep" -> (pipeDocsPrep _),
    "pipe_curate_pack" -> (pipeCuratePack _))

  private val qualityBpDuck =
    """floor((least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.5 +
      |  (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |             x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS DOUBLE)
      |     / len(string_split(text, ' '))) * 0.5) * 10000.0)""".stripMargin

  def oracles: Map[String, String] = Map(
    "pipe_curate_pack" -> (
      s"""WITH qdocs AS (
         |  SELECT * FROM documents WHERE $qualityBpDuck >= 6500
         |), ex AS (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text)
         |    ORDER BY doc_id) AS xrn FROM qdocs
         |), samp AS (
         |  SELECT doc_id, lang, text FROM ex
         |  WHERE xrn = 1
         |    AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'cur'), 1, 8)
         |          AS BIGINT) % 1000000
         |        < CASE WHEN lang = 'en' THEN 500000 ELSE 900000 END
         |), tok AS (
         |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
         |  FROM samp
         |)
         |SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
         |    AS BIGINT) AS pack_id
         |FROM tok ORDER BY doc_id""".stripMargin),
    "pipe_docs_prep" -> (
      s"""WITH qdocs AS (
         |  SELECT * FROM documents WHERE $qualityBpDuck >= 6500
         |), ex AS (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text)
         |    ORDER BY doc_id) AS xrn FROM qdocs
         |), kept AS (
         |  SELECT doc_id, text, lang FROM ex WHERE xrn = 1
         |), """.stripMargin
        + Dedup.candidateCtes("kept") +
        """, jac AS (
          |  SELECT doc_a, doc_b,
          |    round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
          |      (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) AS j
          |  FROM pairs JOIN sh sa ON doc_a = sa.doc_id
          |             JOIN sh sb ON doc_b = sb.doc_id
          |), losers AS (
          |  SELECT DISTINCT doc_b FROM jac WHERE j >= 0.8
          |)
          |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
          |FROM kept WHERE doc_id NOT IN (SELECT doc_b FROM losers)
          |GROUP BY lang ORDER BY lang""".stripMargin))
}
