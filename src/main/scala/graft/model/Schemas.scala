package graft.model

import org.apache.spark.sql.types._

/** Typed row of the cleaned B3 raw zone (reference: committed
  * `raw/pregao_b3/...parquet`, columns per ETL_glue_pregao_B3.json:297-338
  * and src/etl.py:176-183).
  */
case class PregaoB3Row(
    cod: String,
    acao: String,
    tipo: String,
    qtde_teorica: Option[Long],
    part_teorica_porc: Option[Double],
    data_hora: Option[String])

/** One bitcoin price observation (reference:
  * src/bitoin_coin_gecko_api.py:23-29 SQLite table; id is DB-assigned).
  */
case class PrecoBitcoinRow(data_hora: java.sql.Timestamp, preco_brl: Double)

/** One streamed BTC tick (reference: src/ingest_strem_btc.py:52-56 JSON
  * record `{timestamp, price}`).
  */
case class BtcTick(timestamp: String, price: Double)

/** Golden schemas for the reference pipelines (SURVEY.md §1.2, FIXTURES.md). */
object Schemas {

  /** Pre-transform scrape output: pt-BR formatted columns exactly as
    * pandas.read_html yields them (src/etl.py:97-149). `Part. (%)` arrives
    * as a long because pandas parses the pt-BR comma as a thousands
    * separator (SURVEY §2.1 S2).
    */
  val b3Scraped: StructType = StructType(Seq(
    StructField("Código", StringType),
    StructField("Ação", StringType),
    StructField("Tipo", StringType),
    StructField("Qtde. Teórica", StringType),
    StructField("Part. (%)", LongType)))

  /** Raw-zone superset schema, drift-tolerant (SURVEY §1.3): 5 stable
    * columns + drifted `data_hora` + leaked `valor_limpo`
    * (ETL_glue_pregao_B3.json:297-343).
    */
  val b3RawSuperset: StructType = StructType(Seq(
    StructField("cod", StringType),
    StructField("acao", StringType),
    StructField("tipo", StringType),
    StructField("qtde_teorica", LongType),
    StructField("part_teorica_porc", DoubleType),
    StructField("data_hora", StringType),
    StructField("valor_limpo", StringType)))

  /** Refined-zone golden schema (ETL_glue_pregao_B3.json:189-220 + rename
    * :225-239).
    */
  val b3Refined: StructType = StructType(Seq(
    StructField("cod", StringType),
    StructField("acao", StringType),
    StructField("total_qtde_teorica_dos_ultimos_7_dias", LongType),
    StructField("created_at", StringType)))

  /** Streamed BTC tick (src/ingest_strem_btc.py:52-56). */
  val btcStream: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("price", DoubleType)))
}
