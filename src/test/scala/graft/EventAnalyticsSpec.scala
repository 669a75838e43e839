package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.EventAnalytics
import graft.lake.Tables

/** Invariant tests for the event-analytics family (t24/t25/o9/w10) —
  * cross-engine value equality is the driver's DuckDB gate; these pin
  * the semantic properties the oracle can't express.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("t24: no offset cohort exceeds its week-0 size; offsets are dense non-negative") {
    val rows = EventAnalytics.t24Retention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (cohort, rs) =>
      val week0 = rs.find(_.getInt(1) == 0)
        .getOrElse(fail(s"cohort $cohort has no week-0 row")).getLong(2)
      rs.foreach { r =>
        assert(r.getInt(1) >= 0, s"negative offset in $cohort")
        assert(r.getLong(2) <= week0,
          s"cohort $cohort offset ${r.getInt(1)} retains more users than week 0")
      }
    }
    // every user is in exactly one cohort: week-0 totals = distinct users
    val totalWeek0 = rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(totalWeek0 == users,
      s"week-0 cohort sizes sum to $totalWeek0, expected $users distinct users")
  }

  test("w13: dyadic EWMA matches a hand-rolled recursion and shares one log exchange") {
    import spark.implicits._
    // hand-check on a 3-day single-user series: vu 100, 200, 400 (micro
    // units land as value*1e6); horizon covers all rows so the ladder is
    // the full weighted sum
    val rows = EventAnalytics.w13Ewma(spark, sf).collect()
    assert(rows.nonEmpty)
    // per user, recompute the ladder from the vu series and compare
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val vus = rs.sortBy(_.getString(1)).map(_.getLong(2))
      vus.indices.foreach { t =>
        val expected = (0 to math.min(7, t)).map(i =>
          (1L << (7 - i)) * vus(t - i)).sum
        val got = rs.sortBy(_.getString(1)).apply(t).getLong(3)
        assert(got == expected, s"user $u day index $t: $got != $expected")
      }
    }
    // w6 shared-exchange rule: repartition(user_id) serves grain agg AND
    // lag window -> exactly 2 exchanges (user hash + output sort)
    val n = countShuffles(EventAnalytics.w13Ewma(spark, sf))
    assert(n == 2, s"expected 2 exchanges (user hash + output sort), got $n")
  }

  test("w14: streaks match a hand computation and share one log exchange") {
    val rows = EventAnalytics.w14Streaks(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute per user from the raw grain
    val grain = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1)
    rows.foreach { r =>
      val days = grain(r.getLong(0)).map(_._2).sortBy(_.toEpochDay)
      var best = 1L; var cur = 1L; var bestStart = days.head; var curStart = days.head
      days.sliding(2).foreach {
        case Array(a, b) =>
          if (b.toEpochDay == a.toEpochDay + 1) cur += 1
          else { cur = 1; curStart = b }
          if (cur > best) { best = cur; bestStart = curStart }
        case _ => ()
      }
      assert(r.getLong(1) == best,
        s"user ${r.getLong(0)}: streak ${r.getLong(1)} != $best")
      assert(r.getString(2) == bestStart.toString,
        s"user ${r.getLong(0)}: start ${r.getString(2)} != $bestStart")
    }
    // repartition(user) serves grain dedup + both windows + island agg
    val n = countShuffles(EventAnalytics.w14Streaks(spark, sf))
    assert(n == 2, s"expected 2 exchanges (user hash + output sort), got $n")
  }

  test("w15: dev_bp matches a hand recompute from the (type, day) grain") {
    val rows = EventAnalytics.w15DowBaseline(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recompute: daily counts -> per-(type, epoch_day%7)
    // totals -> floor'd basis points
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    def dow(d: java.time.LocalDate): Int = (((d.toEpochDay % 7) + 7) % 7).toInt
    val byTypeDow = daily.groupBy(t => (t._1, dow(t._2)))
    val expect = daily.map { case (t, day, n) =>
      val g = byTypeDow((t, dow(day)))
      val tn = g.map(_._3).sum
      ((t, day.toString), (dow(day), n, n * 10000L * g.length / tn))
    }.toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (d, n, dev) = expect((r.getString(0), r.getString(1)))
      assert(r.getInt(2) == d && r.getLong(3) == n && r.getLong(4) == dev,
        s"${r.getString(0)} ${r.getString(1)}: got " +
          s"(${r.getInt(2)}, ${r.getLong(3)}, ${r.getLong(4)}), " +
          s"want ($d, $n, $dev)")
    }
    // one log-grain agg + the grain-sized baseline window + the output
    // sort — the log is scanned once and never windowed
    val df = EventAnalytics.w15DowBaseline(spark, sf)
    assert(countShuffles(df) <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"w15 should not join:\n$plan")
  }

  test("o11: MAD outlier set equals a plain-Scala exact-median recompute") {
    val got = EventAnalytics.o11MadOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("cast(floor(value * 100) as bigint)").as("vc")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exact interpolated median of 2x-scaled longs is always integral
    def med2x(xs: Seq[Long]): Long = {
      val s0 = xs.map(_ * 2).sorted
      if (s0.length % 2 == 1) s0(s0.length / 2)
      else (s0(s0.length / 2 - 1) + s0(s0.length / 2)) / 2
    }
    val want = raw.groupBy(_._2).flatMap { case (t, rs) =>
      val m2 = med2x(rs.map(_._3).toSeq)
      // mad4 = 2 * median(|2vc - med2|): interpolate on the 2x scale
      val devs = rs.map(r => math.abs(2 * r._3 - m2)).toSeq
      val m4 = med2x(devs) // = 2 * median(devs)
      rs.filter(r => 2 * math.abs(2 * r._3 - m2) > 3 * m4)
        .map(r => (r._1, t, r._3, m2, m4, 2 * math.abs(2 * r._3 - m2)))
        .toSeq
    }.toSet
    assert(got == want,
      s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    assert(want.nonEmpty, "no outlier at this tier — test is vacuous")
  }

  test("w16: rolling distinct matches a windowed recount of the grain") {
    val rows = EventAnalytics.w16RollingDistinct(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val grain = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val byUser = grain.groupBy(_._1)
    val want = grain.map { case (u, day, _) => (u, day) }.distinct.map {
      case (u, day) =>
        val n = byUser(u).filter { case (_, d2, _) =>
          val diff = day.toEpochDay - d2.toEpochDay
          diff >= 0 && diff <= 6
        }.map(_._3).distinct.length.toLong
        ((u, day.toString), n)
    }.toMap
    assert(rows == want)
    assert(want.values.exists(_ > 1), "never more than one type in a week?")
  }

  test("t25: grid is dense per type and interpolated values are bracketed") {
    val rows = EventAnalytics.t25Interpolate(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      // dense: hour strings are consecutive (span size == row count is
      // implied by min/max construction + sequence; spot-check adjacency)
      assert(sorted.length >= 2)
      // every interpolated value lies within [min, max] of the nearest
      // known values on each side (linear interpolation is bracketed)
      val vals = sorted.map(r => (r.getBoolean(2), r.getLong(3)))
      vals.zipWithIndex.filter(_._1._1).foreach { case ((_, v), i) =>
        val prevKnown = vals.take(i).reverse.find(!_._1).map(_._2)
        val nextKnown = vals.drop(i + 1).find(!_._1).map(_._2)
        (prevKnown, nextKnown) match {
          case (Some(p), Some(n)) =>
            // floor() can land 1 below the lower bracket's floored value
            assert(v >= math.min(p, n) - 1 && v <= math.max(p, n) + 1,
              s"$tpe interpolated $v outside bracket [$p, $n]")
          case _ => fail(s"$tpe has an unbracketed interpolated row")
        }
      }
    }
    // at least one real gap is interpolated at this tier
    assert(rows.exists(_.getBoolean(2)), "no interpolated rows — grid degenerate")
  }

  test("o9: flagged rows are beyond 2.5 sigma and are a small tail") {
    val n = Tables.events(spark, sf).count()
    val out = EventAnalytics.o9ZscoreOutliers(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getLong(3)) >= 25000),
      "a flagged row has |z| < 2.5")
    // Chebyshev: P(|z|>2.5) <= 0.16; flag rate must stay a tail
    assert(out.length.toDouble / n <= 0.16, s"${out.length}/$n flagged")
  }

  test("w10: every event lands in exactly two sliding windows") {
    val events = Tables.events(spark, sf).count()
    val agg = EventAnalytics.w10SlidingWindow(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(agg == 2 * events, s"window assignment total $agg != 2 * $events")
  }

  test("o9 moment join broadcasts the per-type moments; the log never shuffles for it") {
    val df = EventAnalytics.o9ZscoreOutliers(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"moments not broadcast back:\n$plan")
  }

  test("w12 transition matrix: row-stochastic in floor'd bp, transition count conserves the log") {
    val rows = EventAnalytics.w12Transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    // per source state: shares sum to 10000 minus at most (fanout-1) floor loss
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val bp = rs.map(_.getLong(3)).sum
      assert(bp <= 10000 && bp > 10000 - rs.length,
        s"$prev shares sum to $bp over ${rs.length} targets")
    }
    // sum of transitions = events - distinct users (each user chain of
    // length n yields n-1 bigrams)
    val e = graft.lake.Tables.events(spark, sf)
    val expected = e.count() -
      e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }
}
