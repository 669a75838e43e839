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

  test("property: FastSS candidate generation is COMPLETE under random indel/sub mutations") {
    // the deletion-alignment completeness argument says every pair within
    // edit distance 2 shares a <=2-deletion variant; uniform-length corpus
    // names never exercise the indel-SHIFT cases, so build an adversarial
    // corpus: random base strings over a tiny alphabet plus copies mutated
    // by 0-3 random inserts/deletes/substitutions, then check the FastSS
    // join finds EXACTLY the pairs the brute all-pairs scan finds
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val strGen = for {
      n <- Gen.choose(3, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val editGen = Gen.choose(0, 2).flatMap {
      case 0 => for { // substitute
        p <- Gen.choose(0, 100); ch <- Gen.oneOf('a', 'b', 'c')
      } yield (s: String) =>
        if (s.isEmpty) s
        else s.updated(p % s.length, ch)
      case 1 => Gen.choose(0, 100).map(p => (s: String) => // delete
        if (s.isEmpty) s
        else s.patch(p % s.length, Nil, 1))
      case _ => for { // insert
        p <- Gen.choose(0, 100); ch <- Gen.oneOf('a', 'b', 'c')
      } yield (s: String) => s.patch(p % (s.length + 1), Seq(ch), 0)
    }
    val corpusGen = for {
      bases <- Gen.listOfN(12, strGen)
      mutants <- Gen.sequence[List[String], String](bases.map { b =>
        for { k <- Gen.choose(0, 3); es <- Gen.listOfN(k, editGen) }
          yield es.foldLeft(b)((acc, e) => e(acc))
      })
    } yield (bases ++ mutants).zipWithIndex.map { case (nm, i) => (i.toLong, nm) }
    val params = Gen.Parameters.default
    (1 to 25).foreach { round =>
      val rows = corpusGen(params, Seed(round.toLong)).get
      import spark.implicits._
      val df = rows.toDF("key", "nm")
        .withColumn(
          "blk", org.apache.spark.sql.functions.lit(0)) // one block: worst case
      val got = graft.queries.FunctionQueries.fastSsPairs(spark, df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ka, sa) <- rows; (kb, sb) <- rows if ka < kb
        d = sparkLev(sa, sb, 2) if d >= 0
      } yield (ka, kb, d)).toSet
      assert(got == want,
        s"round $round: FastSS=${got.size} brute=${want.size}; " +
          s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
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
