package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Levenshtein, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BoundedLevenshtein, LevKernel}

/** `graft_lev` must match Spark's own `levenshtein(l, r, k)` contract
  * EXACTLY — same distances inside the threshold, −1 outside, code-point
  * unicode semantics — because f_edit_distance's oracle runs the plain
  * form in DuckDB and every surviving pair's dist is hash-compared.
  */
class BoundedLevenshteinSpec extends AnyFunSuite {
  import TestSpark._

  private def sparkLev(a: String, b: String, k: Int): Int =
    Levenshtein(Literal.create(a, StringType), Literal.create(b, StringType),
      Some(Literal(k))).eval(InternalRow.empty).asInstanceOf[Int]

  private def ours(a: String, b: String, k: Int): Int =
    LevKernel.bounded(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("matches the built-in on directed cases: strips, bands, bounds, unicode") {
    val cases = Seq(
      ("", "", 0), ("", "abc", 2), ("", "abc", 3), ("abc", "", 5),
      ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("Customer#000000123", "Customer#000000124", 2),
      ("Customer#000000123", "Customer#000100124", 2),
      ("Customer#000000123", "Customer#999999999", 2),
      ("abcdef", "abcdef", 0), ("abcdef", "abcdxf", 0),
      // shifts: insert near the head moves every later char
      ("abcdefgh", "xabcdefgh", 1), ("abcdefgh", "xabcdefgh", 2),
      ("aaaa", "aaaaaaaa", 3), ("aaaa", "aaaaaaaa", 4),
      // surrogate pairs count as ONE code point
      ("a😀b", "ab", 1), ("a😀b", "a😁b", 1),
      ("ação", "acao", 2))
    cases.foreach { case (a, b, k) =>
      assert(ours(a, b, k) == sparkLev(a, b, k),
        s"('$a','$b',$k): ours=${ours(a, b, k)} spark=${sparkLev(a, b, k)}")
    }
  }

  test("property: equals the built-in on random strings over a small alphabet") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small alphabet forces near-miss pairs (random large-alphabet
    // strings are almost always far apart and never exercise the band)
    val gen = for {
      n <- Gen.choose(0, 14)
      m <- Gen.choose(0, 14)
      a <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      b <- Gen.listOfN(m, Gen.oneOf('a', 'b', 'c'))
      k <- Gen.choose(0, 5)
    } yield (a.mkString, b.mkString, k)
    val params = Gen.Parameters.default
    (1 to 2000).foreach { i =>
      val (a, b, k) = gen(params, Seed(i.toLong)).get
      assert(ours(a, b, k) == sparkLev(a, b, k),
        s"seed $i ('$a','$b',$k): ours=${ours(a, b, k)} spark=${sparkLev(a, b, k)}")
    }
  }

  test("codegen parity and null propagation through SQL") {
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    val proj = GenerateMutableProjection.generate(Seq(
      BoundedLevenshtein(Literal.create("Customer#000000123", StringType),
        Literal.create("Customer#000000321", StringType), 2)))
    assert(proj(InternalRow.empty).getInt(0) ==
      ours("Customer#000000123", "Customer#000000321", 2))
    val r = spark.sql(
      "SELECT graft_lev('abc', CAST(NULL AS STRING), 2) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("a NULL threshold literal is rejected, not silently treated as 0") {
    // CAST(NULL AS INT) is foldable and IntegerType; without the guard it
    // would unbox to k=0 and silently change every distance to 0-or-miss
    val e = intercept[Exception] {
      spark.sql("SELECT graft_lev('abc', 'abd', CAST(NULL AS INT))").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("non-null"))
  }

  test("f_edit_distance with graft_lev equals the plain built-in form row for row") {
    import graft.lake.Tables
    val c = Tables.customer(spark, sf).select(
      org.apache.spark.sql.functions.col("c_custkey"),
      org.apache.spark.sql.functions.col("c_nationkey"),
      org.apache.spark.sql.functions.col("c_name"))
    import org.apache.spark.sql.functions._
    val a = c.select(col("c_custkey").as("a_key"),
      col("c_nationkey").as("nk"), col("c_name").as("a_name"))
    val b = c.select(col("c_custkey").as("b_key"),
      col("c_nationkey").as("nk"), col("c_name").as("b_name"))
    val pairs = a.join(b, Seq("nk")).filter(col("a_key") < col("b_key"))
    val plain = pairs.select(col("a_key"), col("b_key"),
      levenshtein(col("a_name"), col("b_name")).as("dist"))
      .filter(col("dist") <= 2).orderBy("a_key", "b_key").collect()
    val fast = graft.queries.FunctionQueries.fEditDistance(spark, sf)
      .collect()
    assert(fast.nonEmpty && fast.toSeq == plain.toSeq)
  }
}
