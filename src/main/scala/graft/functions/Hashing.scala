package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable hash primitives for the LLM-data-pipeline
  * operators (dedup / LSH / fingerprinting).
  *
  * The driver's correctness gate hash-compares Spark output against
  * DuckDB running the oracle SQL on the same parquet — so every hash
  * that *reaches the output* (or decides which rows reach it) must be
  * computable identically in both engines. `xxhash64`/`hash` are
  * Spark-private; md5 is the common denominator:
  *
  *   h32(s) = int(md5(s)[0:8], 16)        — a uniform 32-bit value
  *   Spark:  cast(conv(substr(md5(s),1,8),16,10) as bigint)
  *   DuckDB: cast('0x' || substr(md5(s),1,8) as bigint)
  *
  * Scale note (100 TB): md5 is ~10× slower than xxhash64 per byte, but
  * the hash runs inside a narrow projection (no shuffle, no spill,
  * whole-stage codegen keeps it in the scan stage), so dedup stays
  * scan-bound. A production build would swap `h32Sql` for
  * `xxhash64(...)` — every operator here takes the hash expression as a
  * string constant precisely so that swap is one line.
  */
object Hashing {

  /** SQL fragment: portable 32-bit hash of the string expression `s`. */
  def h32Sql(s: String): String =
    s"cast(conv(substr(md5($s),1,8),16,10) as bigint)"

  /** Column form of [[h32Sql]]. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("bigint")

  /** DuckDB-side rendering of the same hash, for oracle SQL authoring. */
  def h32Duck(s: String): String =
    s"CAST('0x' || substr(md5($s),1,8) AS BIGINT)"

  /** 60-bit variant (15 hex chars — 16 would overflow signed int64 when
    * the high bit is set). Used where 32 bits collide too much, e.g. the
    * simhash bit source.
    */
  def h60Sql(s: String): String =
    s"cast(conv(substr(md5($s),1,15),16,10) as bigint)"

  def h60Duck(s: String): String =
    s"CAST('0x' || substr(md5($s),1,15) AS BIGINT)"

  /** Driver-side evaluation of h32 — bit-identical to the SQL forms.
    * Used to precompute row-independent constants (e.g. LSH hyperplane
    * components) as literals instead of re-hashing per row.
    */
  def h32Host(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }
}
