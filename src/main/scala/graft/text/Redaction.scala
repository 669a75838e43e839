package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables._

/** PII scrubbing — the redaction stage every training-data pipeline
  * runs before text ships (emails, phone numbers, IP addresses →
  * typed placeholder tokens), plus per-doc match counts for the
  * pipeline's audit trail.
  *
  * Extension layer (brief: training-data operations); the reference
  * engine has no redaction stage.
  *
  * Scale shape: pure narrow projection — regex evaluation is per-row,
  * codegen'd (`RegExpReplace`/`RegExpExtractAll` are native Catalyst
  * expressions with compiled-pattern caches), no shuffle anywhere. At
  * 100 TB the stage is scan-bound; patterns compile once per task, not
  * per row.
  *
  * Pattern portability: the patterns below restrict themselves to the
  * syntax Java regex and RE2 (DuckDB) agree on — character classes,
  * bounded repetition, no backrefs/lookaround — so the redacted text is
  * byte-identical cross-engine (the oracle hash checks exactly that).
  * Replacement is all-occurrences on both sides (Spark's default;
  * DuckDB via the 'g' option).
  */
object Redaction {

  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"
  val IpRe    = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Adds `redacted` plus n_emails/n_phones/n_ips audit counts for
    * `textCol`. Email runs before IP so a domain's dots are already
    * collapsed when the IP pattern scans.
    *
    * Counting contract: counts are matches in the INPUT text, counted
    * independently per pattern — overlapping hits (an IP-shaped local
    * part inside an email, e.g. `1.2.3.4@mail.com`) count under every
    * pattern that matches but are redacted once, by the first pass
    * that consumes them; counts are an audit of what was SEEN, not a
    * census of placeholders in `redacted`.
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))))
      .withColumn("n_ips",    size(regexp_extract_all(t, lit(IpRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            IpRe, "<IP>"),
          PhoneRe, "<PHONE>"))
  }

  /** t14: scrub deterministic synthetic PII (the corpus itself has
    * none) — each doc gains an email, a phone, and an IP derived from
    * doc_id, and the oracle hash then asserts the REDACTED TEXT is
    * byte-identical cross-engine, not merely the counts.
    */
  def t14PiiRedact(s: SparkSession, d: String): DataFrame = {
    val withPii = documents(s, d).select(col("doc_id"),
      concat(
        col("text"),
        lit(" u"), col("doc_id").cast("string"), lit("@mail.com call +1-"),
        lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")
      ).as("pii_text"))
    piiScrub(withPii, "pii_text")
      .select(col("doc_id"), col("redacted"),
        col("n_emails"), col("n_phones"), col("n_ips"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t14_pii_redact" -> (t14PiiRedact _),
  )

  def oracles: Map[String, String] = Map(
    "t14_pii_redact" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text || ' u' || CAST(doc_id AS VARCHAR)
         |      || '@mail.com call +1-'
         |      || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-'
         |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
         |      AS pii_text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(pii_text,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$IpRe', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(pii_text, '$EmailRe')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(pii_text, '$PhoneRe')) AS INTEGER) AS n_phones,
         |  CAST(len(regexp_extract_all(pii_text, '$IpRe')) AS INTEGER) AS n_ips
         |FROM p ORDER BY doc_id""".stripMargin,
  )
}
