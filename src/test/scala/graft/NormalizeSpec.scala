package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Normalize

/** graft_nfc + cleanText: Unicode forms actually converge, the kernel
  * matches java.text.Normalizer on hard cases, and the expression
  * behaves under codegen.
  */
class NormalizeSpec extends AnyFunSuite {
  import TestSpark._

  private def clean(texts: String*): Seq[String] = {
    import spark.implicits._
    Normalize.cleanText(texts.toDF("t"), "t")
      .select("clean").collect().toSeq.map(_.getString(0))
  }

  test("composed and decomposed spellings canonicalize to the same bytes") {
    // the exact-dedup motivation: same visible text, different bytes
    val Seq(a, b) = clean("café au lait", "café au lait")
    assert(a == b)
    assert(a == "café au lait")
  }

  test("kernel matches java.text.Normalizer on hard cases") {
    import org.apache.spark.unsafe.types.UTF8String
    // Hangul jamo composition, double-combining stacks, compatibility
    // chars that NFC must NOT touch (ﬁ ligature is NFKC-only)
    val cases = Seq(
      "각",          // jamo -> syllable 각
      "á̧",               // stacked combining marks
      "ﬁle",                    // fi ligature stays under NFC
      "Å vs Å",           // Å composed vs ring
      "")
    cases.foreach { c =>
      val got = graft.functions.NormalizeKernel.nfc(
        UTF8String.fromString(c)).toString
      val want = java.text.Normalizer.normalize(
        c, java.text.Normalizer.Form.NFC)
      assert(got == want, s"mismatch for ${c.map(_.toInt.toHexString)}")
    }
  }

  test("whitespace collapse is explicit-class, not engine-variant \\s") {
    val Seq(a) = clean("a \t\n\r\f bc")
    // U+000B is NOT collapsed (RE2's \s excludes it; we match RE2)
    assert(a == "a bc")
  }

  test("cleanText is idempotent") {
    val once = clean("  MIXED   Case\té  ")
    assert(clean(once.head) == once)
  }

  test("nfc expression under codegen: two instances, null passthrough") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.StringType
    val proj = GenerateMutableProjection.generate(Seq(
      graft.functions.NfcNormalize(Literal.create("é", StringType)),
      graft.functions.NfcNormalize(Literal.create(null, StringType)),
      graft.functions.NfcNormalize(Literal.create("plain", StringType))))
    val row = proj(InternalRow.empty)
    assert(row.getUTF8String(0).toString == "é")
    assert(row.isNullAt(1))
    assert(row.getUTF8String(2).toString == "plain")
  }
}
