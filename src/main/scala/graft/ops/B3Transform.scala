package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The B3 clean/typify transform (SURVEY.md §2.3 P1–P9) as composable
  * `DataFrame => DataFrame` stages. Reference behavior: src/etl.py:153-187
  * with the ÷1000 participation fix from src/scrapping_b3.py:109 (the two
  * reference code paths disagree by 1000×; the committed parquet + SQLite
  * artifacts hold the ÷1000 form, so that is the canonical semantics).
  *
  * Every stage is a narrow (no-shuffle) projection/filter — at 100 TB this
  * whole pipeline fuses into a single WholeStageCodegen span over the scan,
  * with both filters pushed into the source when possible.
  */
object B3Transform {

  /** P1 (src/etl.py:163-164): drop the B3 page's summary rows. */
  def dropSummaryRows(df: DataFrame): DataFrame =
    df.filter(col("Código") =!= "Redutor" &&
      col("Código") =!= "Quantidade Teórica Total")

  /** P3 (src/etl.py:169): strip pt-BR thousands separators ('.') from the
    * theoretical-quantity string. `translate` beats `regexp_replace` here:
    * single-char removal, no regex engine in the hot path.
    */
  def stripThousandsSeparators(c: Column): Column = translate(c, ".", "")

  /** P4 (src/etl.py:170): numeric cast with null-on-error — pandas
    * `errors='coerce'` semantics. `try_cast` keeps that behavior under
    * Spark 4's default ANSI mode.
    */
  def coerceToLong(c: Column): Column = c.try_cast(LongType)

  /** P5 (src/scrapping_b3.py:109): undo pandas' comma-as-thousands parse —
    * the scraped pt-BR "0,494" arrived as long 494; ÷1000 restores the
    * percentage.
    */
  def unscaleParticipation(c: Column): Column = c / lit(1000)

  /** P6 (src/etl.py:176-183): bulk rename to the lake column names. */
  val renames: Map[String, String] = Map(
    "Código" -> "cod",
    "Ação" -> "acao",
    "Tipo" -> "tipo",
    "Qtde. Teórica" -> "qtde_teorica",
    "Part. (%)" -> "part_teorica_porc")

  /** P8 (src/scrapping_b3.py:113): stamp the scrape timestamp as a
    * formatted string — the reference stores timestamps as
    * "yyyy-MM-dd HH:mm:ss" strings (SURVEY §1.2).
    */
  def stampDataHora(df: DataFrame): DataFrame =
    df.withColumn("data_hora",
      date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))

  /** Full P1→P9 pipeline: scraped pt-BR frame → typed raw-zone frame.
    * Mirrors src/etl.py:153-187 (filter ×2 → clean+cast via temp column
    * `valor_limpo` → drop temp (P9) → rename) plus the stamp (P8) and the
    * ÷1000 participation fix.
    */
  def transform(scraped: DataFrame, stampTimestamp: Boolean = true): DataFrame = {
    val cleaned = dropSummaryRows(scraped)
      .withColumn("valor_limpo", stripThousandsSeparators(col("`Qtde. Teórica`")))
      .withColumn("Qtde. Teórica", coerceToLong(col("valor_limpo")))
      .withColumn("Part. (%)", unscaleParticipation(col("`Part. (%)`")))
      .drop("valor_limpo") // P9 (src/etl.py:171)
      .withColumnsRenamed(renames)
    if (stampTimestamp) stampDataHora(cleaned) else cleaned
  }
}
