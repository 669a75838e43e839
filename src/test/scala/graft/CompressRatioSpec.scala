package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CompressKernel, CompressRatioBp}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_compress_bp` — the DEFLATE compressibility quality signal.
  * No DuckDB oracle exists (SQL has no DEFLATE), so this spec IS the
  * correctness gate: semantic ordering, determinism, codegen parity,
  * and the plan shape.
  */
class CompressRatioSpec extends AnyFunSuite {
  import TestSpark._

  private def bp(s: String): Long =
    CompressKernel.ratioBp(UTF8String.fromString(s))

  test("ratio orders text by redundancy: template << prose << high-entropy") {
    val template = "buy now click here " * 200
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across a wide field looking for something new to chase " +
      "while the farmer watches from a distant hill with mild interest"
    val entropy = {
      // deterministic pseudo-random base64-ish text — no Math.random
      val sb = new StringBuilder
      var x = 123456789L
      (1 to 600).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(((x >>> 33) % 64 + 48).toChar)
      }
      sb.toString
    }
    assert(bp(template) < bp(prose),
      s"template ${bp(template)} !< prose ${bp(prose)}")
    assert(bp(prose) < bp(entropy),
      s"prose ${bp(prose)} !< entropy ${bp(entropy)}")
    assert(bp(template) < 1500, s"template should crush: ${bp(template)}")
    assert(bp(entropy) > 7000, s"entropy should resist: ${bp(entropy)}")
  }

  test("edge cases: empty = 10000 by convention, null propagates, unicode counts UTF-8 bytes") {
    assert(bp("") == 10000L)
    val df = spark.sql(
      "SELECT graft_compress_bp(CAST(NULL AS STRING)) AS r")
    assert(df.collect()(0).isNullAt(0))
    // multi-byte input goes through the same byte-level kernel
    assert(bp("ação coração ação coração " * 50) < 2000)
  }

  test("deterministic across repeated evaluation and partitionings") {
    import spark.implicits._
    val docs = graft.lake.Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.repartition(7)
      .select(col("doc_id"), expr("graft_compress_bp(text)").as("r"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    val b = docs.repartition(2, col("text"))
      .select(col("doc_id"), expr("graft_compress_bp(text)").as("r"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("codegen parity: generated projection equals direct kernel evaluation") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    val samples = Seq("", "a", "spam spam spam spam spam", "x y z", "ação")
    samples.foreach { s =>
      val proj = GenerateMutableProjection.generate(Seq(
        CompressRatioBp(Literal.create(s,
          org.apache.spark.sql.types.StringType))))
      assert(proj(InternalRow.empty).getLong(0) == bp(s), s"input '$s'")
    }
  }

  test("the quality-cut projection is narrow and codegen'd (no shuffle, no fallback)") {
    val cut = graft.lake.Tables.documents(spark, sf)
      .select(col("doc_id"), expr("graft_compress_bp(text)").as("r"))
      .filter(col("r") > 1000)
    val plan = cut.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty, s"quality cut should not shuffle:\n$plan")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s"no codegen span:\n$plan")
    assert(cut.count() > 0)
  }
}
