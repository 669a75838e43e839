package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bitcoin batch pipeline (SURVEY §3.3, §2.1 S5, §2.2 K3/K4):
  * REST point-source → one-row frame → JDBC append + daily parquet
  * (/root/reference/src/bitoin_coin_gecko_api.py:33-95).
  *
  * The HTTP GET itself is a non-Spark adapter boundary (the engine
  * ingests whatever JSON string the caller fetched — tests use a
  * fixture); everything from the JSON onward is Spark expressions, so
  * the `data["bitcoin"]["brl"]` extraction is the same
  * `get_json_object` path a scaled ingest job would run per-partition.
  */
object BtcIngest {

  /** The CoinGecko response shape (S5):
    * `{"bitcoin": {"brl": <price>}}` (bitoin_coin_gecko_api.py:43).
    */
  val fixtureResponse: String = """{"bitcoin": {"brl": 633210.55}}"""

  val tickSchema: StructType = StructType(Seq(
    StructField("data_hora", TimestampType),
    StructField("preco_brl", DoubleType)))

  /** S5: one fetched JSON document → the one-row
    * (data_hora, preco_brl) frame the reference builds at
    * bitoin_coin_gecko_api.py:80-83. `now` is injected for determinism.
    */
  def tickFrame(spark: SparkSession, json: String, now: Timestamp): DataFrame = {
    import spark.implicits._
    Seq(json).toDF("raw")
      .select(
        lit(now).as("data_hora"),
        get_json_object(col("raw"), "$.bitcoin.brl")
          .cast(DoubleType).as("preco_brl"))
  }

  /** K4: the local daily single-file layout
    * (`./parquet_arq/preco_bitcoin/ano=Y/mes=MM/dia=DD`,
    * bitoin_coin_gecko_api.py:87-95). One coalesced file per day dir —
    * the reference writes one tiny file per day; `Lake.compact` is the
    * maintenance answer when those accumulate.
    */
  def writeDailySingleFile(df: DataFrame, base: String,
      date: java.time.LocalDate): String = {
    val dir = f"$base/ano=${date.getYear}%04d/mes=${date.getMonthValue}%02d/dia=${date.getDayOfMonth}%02d"
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  /** The full batch pipeline run (§3.3): fetch-result → JDBC append
    * (K3, id DB-owned) + daily parquet (K4). Returns the parquet dir.
    */
  def ingestOnce(spark: SparkSession, json: String, now: Timestamp,
      jdbcUrl: String, parquetBase: String): String = {
    val tick = tickFrame(spark, json, now)
    Jdbc.ensurePrecoBitcoinTable(jdbcUrl)
    Jdbc.append(tick, jdbcUrl, "preco_bitcoin")
    writeDailySingleFile(tick, parquetBase, now.toLocalDateTime.toLocalDate)
  }
}
