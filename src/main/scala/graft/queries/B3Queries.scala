package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables._
import graft.ops.RefinedQuery

/** The reference's refined pipeline (SURVEY.md §3.2) exercised end-to-end
  * on testdata: the part table re-keyed to the B3 column contract
  * (cod, acao, qtde_teorica), run through [[RefinedQuery.refinedDsl]] —
  * gs_now stamp → tautological 7-day filter → group-by sum → top-5 →
  * created_at stamp.
  */
object B3Queries {

  def refinedTop5(s: SparkSession, d: String): DataFrame = {
    val asB3 = part(s, d).select(
      col("p_brand").as("cod"),
      col("p_type").as("acao"),
      col("p_size").cast("long").as("qtde_teorica"))
    RefinedQuery.refinedDsl(asB3)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_b3_refined_top5" -> (refinedTop5 _))

  /** The 7-day filter is a tautology by construction (the timestamp is
    * stamped in-run), so the oracle is the plain group-by top-5; both
    * engines stamp created_at with their own current date. The Spark side
    * runs with session timezone UTC, so the oracle pins UTC too — DuckDB's
    * bare `current_date` is host-local and would flake across midnight on
    * a non-UTC host (ADVICE r1).
    */
  def oracles: Map[String, String] = Map(
    "ref_b3_refined_top5" ->
      """SELECT p_brand AS cod, p_type AS acao,
        |  CAST(sum(p_size) AS BIGINT) AS total_qtde_teorica_dos_ultimos_7_dias,
        |  strftime(timezone('UTC', now()), '%Y-%m-%d') AS created_at
        |FROM part GROUP BY 1, 2
        |ORDER BY total_qtde_teorica_dos_ultimos_7_dias DESC, cod, acao
        |LIMIT 5""".stripMargin)
}
