package graft

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AsOfJoin, RangeJoin}

/** Property checks for the composed join operators: on randomized
  * datasets, the Spark plans must agree with independent plain-Scala
  * reference implementations of the semantics (same style as
  * PropertySpec — raw ScalaCheck generators, fixed seeds, one Spark
  * job per property).
  */
class JoinPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .take(n).toSeq

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private val rowGen: Gen[(Long, Long)] = for {
    k <- Gen.chooseNum(1L, 4L)
    sec <- Gen.chooseNum(0L, 500L)
  } yield (k, sec)

  // left rows get unique ids; right rows are deduped per (k, sec) with
  // max rid — AsOfJoin's documented determinism contract
  private val leftRows = samples(rowGen, 60, seed = 1).zipWithIndex
    .map { case ((k, sec), i) => (k, sec, i.toLong) }
  private val rightRows = samples(rowGen, 60, seed = 1000).zipWithIndex
    .map { case ((k, sec), i) => (k, sec, (1000 + i).toLong) }
    .groupBy { case (k, sec, _) => (k, sec) }
    .map { case (_, rs) => rs.maxBy(_._3) }.toSeq

  private def leftDf = leftRows.map { case (k, s, i) => (k, ts(s), i) }
    .toDF("k", "lts", "lid")
  private def rightDf = rightRows.map { case (k, s, i) => (k, ts(s), i) }
    .toDF("k", "rts", "rid")

  test("asOf agrees with a plain-Scala reference on random data (all directions/tolerances)") {
    for {
      direction <- Seq("backward", "forward")
      tolSec <- Seq(None, Some(60L))
    } {
      val expected = leftRows.flatMap { case (k, lsec, lid) =>
        val cands = rightRows.filter { case (rk, rsec, _) =>
          rk == k &&
            (if (direction == "backward") rsec <= lsec else rsec >= lsec) &&
            tolSec.forall(t => math.abs(rsec - lsec) <= t)
        }
        if (cands.isEmpty) None
        else {
          val best =
            if (direction == "backward") cands.maxBy(_._2)
            else cands.minBy(_._2)
          Some((lid, best._3))
        }
      }.toSet
      val got = AsOfJoin.asOf(leftDf, rightDf, "k", "lts", "rts",
          direction = direction,
          tolerance = tolSec.map(t => s"$t seconds"))
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"direction=$direction tol=$tolSec: extra=${got -- expected} missing=${expected -- got}")
    }
  }

  test("banded range join agrees with a plain-Scala reference on random data") {
    for ((before, after) <- Seq((60L, 0L), (30L, 30L), (0L, 120L))) {
      val expected = (for {
        (lk, lsec, lid) <- leftRows
        (rk, rsec, rid) <- rightRows
        if rk == lk && rsec >= lsec - before && rsec <= lsec + after
      } yield (lid, rid)).toSet
      val got = RangeJoin.banded(leftDf, rightDf, "k", "lts", "rts",
          beforeSec = before, afterSec = after)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"before=$before after=$after: extra=${got -- expected} missing=${expected -- got}")
    }
  }
}
