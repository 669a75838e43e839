package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.model.Schemas
import graft.ops.{B3Transform, Formats}
import graft.ingest.B3Ingest

/** Property-based checks (SURVEY §5 plan item 4): the pt-BR locale
  * parse/format semantics hold across generated values, not just the
  * committed fixtures. Raw ScalaCheck generators with a fixed seed
  * (scalatestplus isn't in the offline cache); each property validates
  * a 100-sample batch in one Spark job.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  /** Render a long the way the B3 page renders quantities:
    * dot-separated thousands ("476.976.044").
    */
  private def ptBrGrouped(n: Long): String =
    String.format(java.util.Locale.US, "%,d", Long.box(n)).replace(",", ".")

  test("P3+P4 round-trip: any grouped pt-BR quantity parses back to the number") {
    val ns = samples(Gen.chooseNum(0L, 999_999_999_999L))
    val rows = ns.zipWithIndex.map { case (n, i) =>
      Row(s"T$i", "TEST", "ON", ptBrGrouped(n), 1L)
    }
    val out = B3Transform.transform(
        spark.createDataFrame(rows.asJava, Schemas.b3Scraped),
        stampTimestamp = false)
      .orderBy(length(col("cod")), col("cod"))
    // row order: T0..T99 in insertion order via the cod sort key
    val got = out.select("cod", "qtde_teorica").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ns.zipWithIndex.foreach { case (n, i) =>
      assert(got(s"T$i") == n, s"n=$n")
    }
  }

  private def length(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.length(c)
  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("P4 coerce: any non-numeric quantity string nulls, never throws") {
    val junks = samples(Gen.alphaStr.suchThat(s => s.nonEmpty && s.exists(!_.isDigit)), 50)
    val rows = junks.zipWithIndex.map { case (j, i) => Row(s"T$i", "x", "y", j, 1L) }
    val out = B3Transform.transform(
      spark.createDataFrame(rows.asJava, Schemas.b3Scraped),
      stampTimestamp = false)
    assert(out.filter(col("qtde_teorica").isNotNull).count() == 0)
  }

  test("K7 brMoney: swapped separators match Python f'{v:,.2f}' semantics for all prices") {
    import spark.implicits._
    val cents = samples(Gen.chooseNum(0L, 99_999_999_999L))
    val vs = cents.map(_ / 100.0)
    val got = vs.toDF("v").select(Formats.brMoney($"v").as("s"))
      .collect().map(_.getString(0))
    vs.zip(got).foreach { case (v, g) =>
      val expected = String.format(java.util.Locale.US, "%,.2f", Double.box(v))
        .map { case ',' => '.'; case '.' => ','; case c => c }
      assert(g == expected, s"v=$v")
    }
  }

  test("S1/S2: the adapter's comma-thousands parse matches pandas for any grouped int") {
    samples(Gen.chooseNum(0L, 9_999_999L), 50).foreach { n =>
      val cell = String.format(java.util.Locale.US, "%,d", Long.box(n))
      val rows = B3Ingest.parseHtmlTable(
        s"<table><tr><td>A</td><td>B</td><td>C</td><td>1</td><td>$cell</td></tr></table>")
      assert(rows.head.getLong(4) == n)
    }
  }
}
