package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{BtcIngest, Jdbc}

/** JDBC round-trip (S4/S7/K3) against embedded Derby + the bitcoin
  * batch pipeline (S5/K4). Oracle coverage is N/A here by design — JDBC
  * is I/O plumbing, not query semantics (r1 verdict item 4).
  */
class IngestSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private def derbyUrl(name: String): String = {
    val dir = Files.createTempDirectory(s"derby_$name").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("K3+S7: JDBC append keeps the id DB-owned; ordered read returns newest first") {
    val url = derbyUrl("roundtrip")
    Jdbc.ensurePrecoBitcoinTable(url)
    val t1 = Timestamp.valueOf("2025-07-31 23:52:19")
    val t2 = Timestamp.valueOf("2025-08-01 00:10:00")
    Jdbc.append(Seq((t1, 630000.10)).toDF("data_hora", "preco_brl"), url, "preco_bitcoin")
    Jdbc.append(Seq((t2, 633210.55)).toDF("data_hora", "preco_brl"), url, "preco_bitcoin")

    val hist = Jdbc.readOrderedDesc(spark, url, "preco_bitcoin", "ID").collect()
    assert(hist.length == 2)
    // identity column assigned 1, 2 by the DB — not by Spark
    assert(hist.map(_.getInt(0)).sameElements(Array(2, 1)))
    assert(hist.head.getTimestamp(1) == t2)
    assert(hist.head.getDouble(2) == 633210.55)
  }

  test("ensurePrecoBitcoinTable is idempotent (CREATE TABLE IF NOT EXISTS semantics)") {
    val url = derbyUrl("idempotent")
    Jdbc.ensurePrecoBitcoinTable(url)
    Jdbc.ensurePrecoBitcoinTable(url) // must not throw
  }

  test("S4: full-table JDBC scan sees appended rows with the declared schema") {
    val url = derbyUrl("scan")
    Jdbc.ensurePrecoBitcoinTable(url)
    Jdbc.append(
      Seq((Timestamp.valueOf("2025-08-01 12:00:00"), 1.0))
        .toDF("data_hora", "preco_brl"), url, "preco_bitcoin")
    val df = Jdbc.readTable(spark, url, "preco_bitcoin")
    assert(df.columns.map(_.toLowerCase).sameElements(
      Array("id", "data_hora", "preco_brl")))
    assert(df.count() == 1)
  }

  test("S5: fixture JSON -> one-row tick frame with extracted price") {
    val now = Timestamp.valueOf("2025-08-01 15:37:26")
    val tick = BtcIngest.tickFrame(spark, BtcIngest.fixtureResponse, now)
    val row = tick.collect().head
    // names+types (lit(now) is non-nullable, the declared schema is lax)
    assert(tick.schema.map(f => (f.name, f.dataType)) ==
      BtcIngest.tickSchema.map(f => (f.name, f.dataType)))
    assert(row.getTimestamp(0) == now)
    assert(row.getDouble(1) == 633210.55)
  }

  test("S1: HTML-table adapter reproduces the pandas scrape shape, locale strings intact") {
    val page1 =
      """<table class="table"><tr><th>Código</th><th>Ação</th><th>Tipo</th>
        |<th>Qtde. Teórica</th><th>Part. (%)</th></tr>
        |<tr><td>ALOS3</td><td>ALLOS</td><td>ON ED NM</td><td>476.976.044</td><td>0,494</td></tr>
        |<tr><td>Redutor</td><td></td><td></td><td>1.000</td><td>1</td></tr>
        |</table>""".stripMargin
    val page2 =
      """<table><tr><td>PETR4</td><td>PETROBRAS</td><td>PN N2</td>
        |<td>3.700.000.000</td><td>4,129</td></tr></table>""".stripMargin
    val df = graft.ingest.B3Ingest.toDataFrame(spark, Seq(page1, page2))
    // pages stacked UNION ALL-style; header row skipped
    assert(df.count() == 3)
    val alos = df.filter(df("Código") === "ALOS3").head()
    assert(alos.getString(3) == "476.976.044")  // qtde stays locale string
    assert(alos.getLong(4) == 494L)             // pandas comma-thousands quirk
    // downstream: the existing B3 transform consumes the adapter output
    val out = graft.ops.B3Transform.transform(df, stampTimestamp = false)
    assert(out.filter(out("cod") === "ALOS3").head().getLong(3) == 476976044L)
    assert(out.count() == 2)                    // Redutor filtered (P1)
  }

  test("bitcoin pipeline e2e: JDBC history grows + K4 daily single-file parquet layout") {
    val url = derbyUrl("e2e")
    val base = Files.createTempDirectory("btc_parquet").toString
    val d1 = Timestamp.valueOf("2025-07-31 23:52:19")
    val d2 = Timestamp.valueOf("2025-08-01 09:00:00")
    val dir1 = BtcIngest.ingestOnce(spark, BtcIngest.fixtureResponse, d1, url, base)
    val dir2 = BtcIngest.ingestOnce(spark, BtcIngest.fixtureResponse, d2, url, base)

    assert(dir1.endsWith("ano=2025/mes=07/dia=31"))
    assert(dir2.endsWith("ano=2025/mes=08/dia=01"))
    // K4: exactly one data file per day dir (coalesce(1))
    Seq(dir1, dir2).foreach { dir =>
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"expected 1 file in $dir")
    }
    // S7: two ticks in the DB, newest first — typed via the model row
    val hist = Jdbc.readOrderedDesc(spark, url, "preco_bitcoin", "ID")
      .selectExpr("DATA_HORA as data_hora", "PRECO_BRL as preco_brl")
      .as[graft.model.PrecoBitcoinRow].collect()
    assert(hist.length == 2 && hist.head.data_hora == d2)
    // partition-discovery read over the whole K4 tree sees both days
    assert(spark.read.parquet(base).count() == 2)
  }
}
