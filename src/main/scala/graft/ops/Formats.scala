package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalar function surface of the reference (SURVEY.md §2.8) as pure
  * Column functions — all codegen'd built-ins, no UDFs.
  */
object Formats {

  /** BR money format (src/bitoin_coin_gecko_api.py:46,66): Python
    * `f"{v:,.2f}"` then swap `,`↔`.` — 1234567.89 → "1.234.567,89".
    * `format_number` gives the en-US grouping; `translate` swaps the
    * separators in one pass.
    */
  def brMoney(c: Column): Column = translate(format_number(c, 2), ",.", ".,")

  /** Zero-padded partition value `{:02d}` (src/etl.py:203). */
  def zeroPad2(c: Column): Column = lpad(c.cast("string"), 2, "0")

  /** JSON path extract (src/bitoin_coin_gecko_api.py:43
    * `data["bitcoin"]["brl"]`): string JSON → typed value.
    */
  def jsonLong(c: Column, path: String): Column =
    get_json_object(c, path).try_cast(LongType)

  /** `json.dumps({timestamp, price})` (src/ingest_strem_btc.py:52-56). */
  def tickJson(timestamp: Column, price: Column): Column =
    to_json(struct(timestamp.as("timestamp"), price.as("price")))

  /** Timestamp-as-string encoding used across the reference
    * (src/scrapping_b3.py:113, SURVEY §1.2).
    */
  def tsString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
