package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.jdk.CollectionConverters._
import graft.model.Schemas

/** S1: the HTML-table scrape boundary
  * (/root/reference/src/etl.py:97-149, scrapping_b3.py:59-96).
  *
  * The browser automation itself (Selenium, pagination clicks) is
  * outside the engine — callers hand this adapter the page HTML (or any
  * table text); the adapter is the thin `Seq[Row] => DataFrame` boundary
  * SURVEY §7 plans: everything after `toDataFrame` is Spark.
  *
  * Locale quirks reproduced exactly as pandas.read_html produced them
  * (SURVEY §2.1 S2, verified against the committed SQLite rows):
  *   - `Qtde. Teórica` stays a STRING with dots ("476.976.044") — the
  *     Spark-side transform (B3Transform P3/P4) strips and casts;
  *   - `Part. (%)` ("0,494") parses comma-as-thousands to LONG 494 —
  *     the ÷1000 rescale (P5) later restores the percentage.
  */
object B3Ingest {

  private val RowRe = "(?s)<tr[^>]*>(.*?)</tr>".r
  private val CellRe = "(?s)<t[dh][^>]*>(.*?)</t[dh]>".r
  private val TagRe = "<[^>]+>".r

  /** Parse one page's HTML table body into scraped-schema Rows.
    * Header rows (matching the `Código` header, like pandas
    * `match='Código'`) are skipped; short rows are ignored.
    */
  def parseHtmlTable(html: String): Seq[Row] =
    RowRe.findAllMatchIn(html).map { m =>
      CellRe.findAllMatchIn(m.group(1))
        .map(c => TagRe.replaceAllIn(c.group(1), "").trim).toSeq
    }.collect {
      case cells if cells.length >= 5 && cells.head != "Código" =>
        Row(cells(0), cells(1), cells(2), cells(3),
          parsePtBrAsLong(cells(4)))
    }.toSeq

  /** pandas' comma-as-thousands integer parse of a pt-BR decimal:
    * "0,494" → 494L; null on anything non-numeric (read_html leaves
    * NaN).
    */
  private[ingest] def parsePtBrAsLong(s: String): java.lang.Long =
    try java.lang.Long.valueOf(s.replace(",", "").replace(".", ""))
    catch { case _: NumberFormatException => null }

  /** The paginated scrape (5 page clicks in the reference,
    * etl.py:36,133): page frames stacked UNION ALL-style (O4,
    * `pd.concat(ignore_index=True)` ≙ unionByName).
    */
  def toDataFrame(spark: SparkSession, pages: Seq[String]): DataFrame = {
    val frames = pages.map(p =>
      spark.createDataFrame(parseHtmlTable(p).asJava, Schemas.b3Scraped))
    frames.reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }
}
