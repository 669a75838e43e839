package graft.ingest

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source/sink surface of the reference (SURVEY §2.1 S4/S7, §2.2
  * K3): the SQLite leg (/root/reference/src/query_db.py:18-19,
  * bitoin_coin_gecko_api.py:50-60) re-expressed as Spark JDBC I/O.
  * Tests run against embedded Derby (ships with Spark's Hive support) —
  * the engine code is driver-agnostic, any JDBC URL works.
  *
  * Scale notes: a single-partition JDBC read is fine for the
  * reference's small operational tables; for big tables pass
  * `partitionColumn/lowerBound/upperBound/numPartitions` via `options`
  * so the scan parallelizes — exposed here as a passthrough instead of
  * hidden defaults.
  */
object Jdbc {

  /** S4: full-table scan (`SELECT * FROM pregao_b3` shape). */
  def readTable(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val props = new Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(url, table, props)
  }

  /** S7: full-history read, newest first
    * (`SELECT id, data_hora, preco_brl FROM preco_bitcoin ORDER BY id
    * DESC`, bitoin_coin_gecko_api.py:59-60).
    */
  def readOrderedDesc(spark: SparkSession, url: String, table: String,
      idCol: String = "id"): DataFrame =
    readTable(spark, url, table).orderBy(desc(idCol))

  /** K3: append rows; the surrogate id stays DB-owned (identity
    * column), exactly like the reference's AUTOINCREMENT — Spark lists
    * only the DataFrame's columns in its INSERT, so the DB fills `id`.
    */
  def append(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("append").jdbc(url, table, new Properties())

  /** DDL for the reference's `preco_bitcoin` table
    * (bitoin_coin_gecko_api.py:23-29), in Derby dialect: INTEGER
    * PRIMARY KEY AUTOINCREMENT → GENERATED ALWAYS AS IDENTITY.
    * Idempotent like the reference's CREATE TABLE IF NOT EXISTS.
    */
  def ensurePrecoBitcoinTable(url: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        """CREATE TABLE preco_bitcoin (
          |  id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
          |  data_hora TIMESTAMP,
          |  preco_brl DOUBLE)""".stripMargin)
      catch {
        // Derby: "already exists" → X0Y32; IF NOT EXISTS semantics
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      } finally st.close()
    } finally conn.close()
  }
}
