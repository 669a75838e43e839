package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables._
import graft.functions.NormalizeExpression

/** Text canonicalization — the first stage of a corpus-cleaning
  * pipeline: Unicode NFC (via the native [[graft.functions.NfcNormalize]]
  * expression; Spark itself has no normalizer), whitespace collapse,
  * trim, and lowercase. Everything downstream (exact-dedup hashes,
  * shingles, token splits) assumes canonical bytes; without this stage
  * the same visible text arriving composed vs decomposed defeats all of
  * them.
  *
  * Scale shape: pure narrow projection, fully codegen'd (the NFC kernel
  * fast-paths already-normalized text — virtually all of a real corpus
  * — with a non-allocating check). Scan-bound at 100 TB.
  *
  * Cross-engine notes: DuckDB's `nfc_normalize` implements the same
  * normalization form, so NFC output is byte-identical. The whitespace
  * class is written out explicitly (`[ \t\n\r\f]`) because Java's `\s`
  * includes U+000B where RE2's does not.
  */
object Normalize {

  private val WsRe = "[ \\t\\n\\r\\f]+"

  /** Adds `clean`: NFC → collapse whitespace runs to one space → trim
    * → lowercase.
    */
  def cleanText(df: DataFrame, textCol: String): DataFrame = {
    NormalizeExpression.ensureRegistered(df.sparkSession)
    df.withColumn("clean",
      lower(trim(regexp_replace(
        expr(s"graft_nfc($textCol)"), WsRe, " "))))
  }

  /** t15: canonicalize docs that are deliberately dirtied with a
    * decomposed accent (e + U+0301), mixed case, and a tab run — the
    * corpus itself is ASCII/NFC, so the query plants the hazards and
    * the oracle hash asserts the cleaned text is byte-identical
    * cross-engine (composed é, collapsed spaces, lowercased).
    * `len_raw`/`len_clean` pin the code-point accounting (the combining
    * pair collapses into one code point).
    */
  def t15Normalize(s: SparkSession, d: String): DataFrame = {
    val dirty = documents(s, d).select(col("doc_id"),
      concat(col("text"),
        lit(" CAFE caf"), lit("e\u0301"), lit(" x\t\t y")).as("raw"))
    cleanText(dirty, "raw")
      .select(col("doc_id"),
        length(col("raw")).as("len_raw"),
        length(col("clean")).as("len_clean"),
        col("clean"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t15_normalize" -> (t15Normalize _),
  )

  def oracles: Map[String, String] = Map(
    "t15_normalize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' CAFE caf' || chr(101) || chr(769) || ' x'
        |         || chr(9) || chr(9) || ' y' AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(raw) AS INTEGER) AS len_raw,
        |  CAST(length(lower(trim(regexp_replace(nfc_normalize(raw),
        |    '[ \t\n\r\f]+', ' ', 'g')))) AS INTEGER) AS len_clean,
        |  lower(trim(regexp_replace(nfc_normalize(raw),
        |    '[ \t\n\r\f]+', ' ', 'g'))) AS clean
        |FROM p ORDER BY doc_id""".stripMargin,
  )
}
