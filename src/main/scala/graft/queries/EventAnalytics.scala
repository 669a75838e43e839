package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.Tables._

/** Product-analytics operators over the `events` stream table — the
  * families a warehouse team runs daily on an event log next to the
  * funnel (w9) and sessionize (w4) ops: cohort retention, time-series
  * regularization (resample + interpolate), moment-based anomaly
  * flagging, and sliding-window aggregation.
  *
  * Cross-engine determinism: every DOUBLE that reaches output or a
  * comparison is derived from EXACT integer aggregates (floor'd
  * fixed-point units summed as bigint — sum order can't perturb them),
  * so both engines compute bit-identical doubles from identical inputs
  * with identical operation order; outputs floor to fixed-point bigints.
  * Timestamps format to strings (ns-vs-µs dtype mismatch otherwise).
  */
object EventAnalytics {

  /** Micro-units fixed point for event `value` sums: floor(v·1e6) as
    * bigint. Exact under summation (|v| ≤ ~600 ⇒ ≤ 6e8 per row; 1e10
    * rows to bigint overflow), deterministic under any partitioning.
    */
  private val ValueU = "cast(floor(value * 1000000) as bigint)"

  /** t24: weekly cohort retention — users grouped by first-seen week,
    * distinct-user counts at each later week offset. THE standard
    * engagement query over an event log.
    *
    * Scale shape: events collapse to (user, week) grain FIRST (one
    * shuffle with map-side partials — the raw log never reaches the
    * window), the per-user cohort week is a window min over that grain
    * (second shuffle, user grain), and the final count groups the
    * user-week rows (third, cohort×offset grain ≤ weeks²). A user
    * appears once per (user, week), so count(*) ≡ count(distinct
    * user_id) with no distinct expansion.
    */
  def t24Retention(s: SparkSession, d: String): DataFrame = {
    val uw = events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .groupBy("user_id", "w").agg(count(lit(1)).as("n_events"))
    val cohort = uw.withColumn("cw",
      min(col("w")).over(Window.partitionBy("user_id")))
    cohort
      .groupBy(col("cw"), (datediff(col("w"), col("cw")) / 7).cast("int")
        .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"), col("n_users"))
      .orderBy("cohort", "week_offset")
  }

  /** t25: hourly resample + linear interpolation — regularize an
    * irregular event series onto a dense per-type hour grid, filling
    * gaps by interpolating between the bracketing observed hours
    * (the forward-fill w8's two-sided sibling; ML feature pipelines
    * want this shape for windowed models).
    *
    * Scale shape: the log collapses to (type, hour) grain in one
    * map-side-partial shuffle; the grid explodes from a 1-row-per-type
    * span agg and joins the grain AT GRAIN SIZE (both sides bounded by
    * types × hours — the raw log is out of the join entirely);
    * the interpolation windows partition by type over the HOURLY series
    * — bounded rows per partition regardless of event volume. Partition
    * keys are low-cardinality here; the real deployment partitions by
    * (entity, type) with the identical plan.
    *
    * The grid spans each type's observed [min, max] hour, so every
    * interpolated row is bracketed on both sides — no edge nulls.
    */
  def t25Interpolate(s: SparkSession, d: String): DataFrame = {
    val k = events(s, d)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        expr(ValueU).as("vu"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt"), sum("vu").as("sum_u"))
      // hourly mean in micro-units: exact ints in, deterministic double out
      .withColumn("v", col("sum_u").cast("double") / col("cnt"))
    val grid = k.groupBy("event_type")
      .agg(min("h").as("mn"), max("h").as("mx"))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
    val merged = grid.join(k, Seq("event_type", "h"), "left")
      .withColumn("hn_", (unix_timestamp(col("h")) / 3600L).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("hn_")
    val prev = w.rowsBetween(Window.unboundedPreceding, 0)
    val next = w.rowsBetween(0, Window.unboundedFollowing)
    val known = when(col("v").isNotNull, col("hn_"))
    merged
      .withColumn("vp", last(col("v"), ignoreNulls = true).over(prev))
      .withColumn("hp", last(known, ignoreNulls = true).over(prev))
      .withColumn("vn", first(col("v"), ignoreNulls = true).over(next))
      .withColumn("hnx", first(known, ignoreNulls = true).over(next))
      .withColumn("out",
        when(col("v").isNotNull, col("v"))
          .otherwise(col("vp") + (col("vn") - col("vp")) *
            ((col("hn_") - col("hp")).cast("double") / (col("hnx") - col("hp")))))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour"),
        col("v").isNull.as("interp"),
        floor(col("out")).cast("long").as("value_u"))
      .orderBy("event_type", "hour")
  }

  /** o9: z-score anomaly flagging — per-type mean/std from EXACT
    * integer moments (centi-unit floor'd values, bigint sums: immune to
    * fp sum order), outliers at |z| > 2.5. Winsorize (o8) bounds tails;
    * this NAMES them.
    *
    * Scale shape: one map-side-partial agg to 1 row per type; the tiny
    * moment table broadcasts back (t16's threshold-broadcast shape —
    * the log never shuffles); flagging is a codegen'd projection.
    * Squares fit bigint to ~1e15 rows per type at this value range.
    */
  def o9ZscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d)
      .select(col("event_id"), col("event_type"),
        expr("cast(floor(value * 100) as bigint)").as("vc"))
    val m = base.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("vc").as("s1"),
      sum(col("vc") * col("vc")).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("std", sqrt(col("s2").cast("double") / col("n") -
        col("mean") * col("mean")))
      .select("event_type", "mean", "std")
    base.join(broadcast(m), "event_type")
      .withColumn("z", (col("vc").cast("double") - col("mean")) / col("std"))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"), col("vc").as("value_c"),
        floor(col("z") * 10000).cast("long").as("z_bp"))
      .orderBy("event_type", "event_id")
  }

  /** o11: robust outliers via median absolute deviation — o9's moment
    * z-score breaks on the very outliers it hunts (one extreme value
    * drags mean AND std); the MAD flag `|x − med| > 3·MAD` (≈ 2σ under
    * normality via the 1.4826 consistency factor, which the integer
    * form absorbs into the threshold) survives up to 50% contamination.
    *
    * Integer exactness (the ×2 trick): medians interpolate (a+b)/2,
    * which is fractional on even counts — but the median of 2·vc is
    * (2a+2b)/2 = a+b, ALWAYS integral, and 2·median(|2vc − med2|) is
    * likewise integral, so both engines cast exactly-integral doubles
    * to bigint and every comparison is pure integer: the flag is
    * `2·|2vc − med2| > 3·mad4`. No float ordering anywhere.
    *
    * Scale shape: exact medians are not algebraic, so this is
    * honestly TWO aggregation passes over the log plus the filter pass
    * (o9's moment form does one — that is the robustness trade);
    * each per-type median is a partial-aggregable count-digest, both
    * stat relations are |types|-sized broadcasts, and every pass is
    * scan-bound. The approx swap (`approx_percentile`) drops a pass
    * once tolerance is acceptable — the a6/v1 documented pattern.
    */
  def o11MadOutliers(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d).select(col("event_id"), col("event_type"),
      expr("cast(floor(value * 100) as bigint)").as("vc"))
    val med = base.groupBy("event_type")
      .agg(expr("cast(percentile(2 * vc, 0.5) as bigint)").as("med2"))
    val withMed = base.join(broadcast(med), "event_type")
    val mad = withMed.groupBy("event_type")
      .agg(expr("cast(2 * percentile(abs(2 * vc - med2), 0.5) as bigint)")
        .as("mad4"))
    withMed.join(broadcast(mad), "event_type")
      .filter(expr("2 * abs(2 * vc - med2) > 3 * mad4"))
      .select(col("event_id"), col("event_type"), col("vc").as("value_c"),
        col("med2"), col("mad4"),
        expr("2 * abs(2 * vc - med2)").as("dev4"))
      .orderBy("event_type", "event_id")
  }

  /** w16: trailing-7-day rolling DISTINCT count — engagement breadth
    * (how many event types did each user touch this week), the window
    * Spark has no native aggregate for (`count(distinct) over` is
    * unsupported): `collect_set` over a RANGE frame, sized after. The
    * set state is bounded by |event types|, so the workaround is safe
    * exactly when the distinct domain inside a frame is small — the
    * caveat the scaladoc exists to state.
    *
    * Scale shape: the log collapses once to the (user, day, type)
    * grain; the range window runs per user over grain rows (≤ types ×
    * days each), and the final dedup to (user, day) reuses grain-sized
    * relations. The raw log is scanned once.
    */
  def w16RollingDistinct(s: SparkSession, d: String): DataFrame = {
    val grain = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
      .withColumn("ed",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("user_id").orderBy(col("ed"))
      .rangeBetween(-6, 0)
    grain
      .withColumn("n_types_7d",
        size(collect_set(col("event_type")).over(w)).cast("long"))
      .dropDuplicates("user_id", "day")
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("n_types_7d"))
      .orderBy("user_id", "day")
  }

  /** w10: sliding-window aggregation — 2-hour windows sliding by 1 hour
    * (each event lands in exactly two windows), the batch form of the
    * streaming hop-window agg. Spark's `window()` generator keeps this
    * a groupBy with map-side partials: the double-counting happens in
    * the window-assignment projection, not a self-union of the log.
    */
  def w10SlidingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(expr(ValueU)).as("sum_u"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm")
        .as("window_start"), col("event_type"), col("n_events"), col("sum_u"))
      .orderBy("window_start", "event_type")

  /** t26: DAU/WAU stickiness — daily active users over trailing-7-day
    * active users, the engagement ratio product dashboards lead with.
    *
    * Scale shape: the log collapses ONCE to the distinct (user, day)
    * grain (one shuffle with map-side partials — the raw event volume
    * never appears again); DAU is a count at that grain; WAU comes from
    * exploding each grain row to the ≤7 future days it covers (fan-out
    * ×7 of the GRAIN, not the log) and counting distinct covers per
    * day. No sliding distinct-over-window (whose state is the window's
    * user set) and no self-join of the log. Exact integers end to end;
    * the ratio floors to basis points.
    */
  def t26Stickiness(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(expr("sequence(0, 6)")).as("i"), col("day"))
      .select(col("user_id"), expr("date_add(day, i)").as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        expr("dau * 10000 div wau").as("stickiness_bp"))
      .orderBy("day")
  }

  /** w12: the event-type transition matrix — per-user ordered bigram
    * counts plus each transition's share of its source state in basis
    * points (the empirical Markov kernel; path analysis, "what follows
    * signup", anomaly drift vs a prior snapshot).
    *
    * Scale shape: ONE log-sized shuffle — the lag window partitions by
    * user_id (high cardinality, the w2/w4 grain rule) — then the
    * count collapses to ≤ |types|² rows, and the share window runs on
    * that tiny relation. Shares are integer basis points (t26's
    * floor-division convention): no double sums anywhere.
    */
  def w12Transitions(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(byTime))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("share_bp",
        expr("n * 10000 div sum(n) over (partition by prev_type)"))
      .orderBy("prev_type", "event_type")
  }

  /** w13: exponentially-weighted trailing average of each user's daily
    * spend — the exponential-decay smoother the w-family lacked (w6 and
    * w10 are uniform-weight frames). α = 1/2 over an 8-term horizon,
    * carried in ×128 fixed point: the weights 128, 64, …, 1 are exact
    * dyadic integers, so the op is integer arithmetic end to end — no
    * float summation order anywhere (the transcendental-free
    * determinism rule) — and the truncation error vs the
    * infinite-horizon recursion is < max|v|/128 of one step.
    *
    * Scale shape: ONE log-sized exchange — repartition(user_id)
    * satisfies BOTH the (user, day) grain aggregation (hash on a key
    * subset clusters the finer grain) and the lag window's
    * partitioning (the w6 shared-exchange rule, asserted in
    * EventAnalyticsSpec); the lag ladder is seven codegen'd window
    * lags over the (user, day) GRAIN, never the raw log.
    */
  def w13Ewma(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy("user_id").orderBy("day")
    val g = events(s, d)
      .repartition(col("user_id"))
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(expr(ValueU)).as("vu"))
    val ewma = (col("vu") * lit(128L)) +: (1 to 7).map(i =>
      coalesce(lag(col("vu"), i).over(byDay), lit(0L)) * lit(1L << (7 - i)))
    g.withColumn("ewma_x128", ewma.reduce(_ + _))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("vu"), col("ewma_x128"))
      .orderBy("user_id", "day")
  }

  /** w14: gaps-and-islands — each user's LONGEST run of consecutive
    * active days (the streak metric engagement dashboards ship). The
    * classic island key: epoch-day − row_number is constant exactly
    * across consecutive days, so islands fall out of one lag-free
    * window plus a re-aggregation; integer arithmetic end to end.
    *
    * Scale shape: the log collapses to the distinct (user, day) grain
    * first; repartition(user) then serves the ordering window, the
    * island aggregation, AND the best-streak pick (hash on user
    * clusters every finer grain — the w6/w13 shared-exchange rule), so
    * the raw log shuffles once and the window inputs are grain-sized.
    * Ties: the longest streak with the earliest start wins.
    */
  def w14Streaks(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy("user_id").orderBy("day")
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .repartition(col("user_id"))
      .dropDuplicates("user_id", "day")
    val islands = ud
      .withColumn("island",
        datediff(col("day"), lit("1970-01-01").cast("date")) -
          row_number().over(byDay))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"),
        min("day").as("streak_start"), max("day").as("streak_end"))
    val best = Window.partitionBy("user_id")
      .orderBy(desc("len"), asc("streak_start"))
    islands
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("len").as("best_streak"),
        date_format(col("streak_start"), "yyyy-MM-dd").as("streak_start"),
        date_format(col("streak_end"), "yyyy-MM-dd").as("streak_end"))
      .orderBy("user_id")
  }

  /** w15: day-of-week seasonal baseline — each (event_type, day)'s
    * traffic as a share of that type's AVERAGE for the same weekday,
    * in floor'd basis points (10000 = exactly on-baseline). The
    * deseasonalized anomaly view every ops dashboard ships: a Monday
    * spike only flags if it beats typical Mondays, not the weekend dip.
    *
    * Weekday is `epoch_day % 7` — pure integer arithmetic, identical
    * in both engines, no locale/week-start calendar semantics (Spark
    * `dayofweek` is Sunday=1, DuckDB's is Sunday=0; the modulus
    * sidesteps the off-by-one entirely). The ratio is
    * `n * 10000 * dn div tn` (observed over mean = n·dn/tn) — all
    * bigint, no double division anywhere.
    *
    * Scale shape: the log collapses to the (type, day) grain in ONE
    * shuffle with map-side partials (grain ≤ |types|·|days| — tiny);
    * the weekday baseline is a window over that GRAIN (the w12
    * post-agg-window pattern — windowing the raw log would be the w11
    * anti-pattern, but this window's input is grain-sized by
    * construction). A broadcast-join formulation was measured to scan
    * and grain-aggregate the log TWICE (no exchange reuse across the
    * agg's two consumers) — the window form reads the log once.
    */
  def w15DowBaseline(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7)))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dow"), col("n"),
        expr("n * 10000 * count(*) over (partition by event_type, dow)" +
          " div sum(n) over (partition by event_type, dow)").as("dev_bp"))
      .orderBy("event_type", "day")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o11_mad_outliers" -> (o11MadOutliers _),
    "w16_rolling_distinct" -> (w16RollingDistinct _),
    "w15_dow_baseline" -> (w15DowBaseline _),
    "w14_streaks"      -> (w14Streaks _),
    "w13_ewma"         -> (w13Ewma _),
    "w12_transitions"  -> (w12Transitions _),
    "t24_retention"    -> (t24Retention _),
    "t25_interpolate"  -> (t25Interpolate _),
    "t26_stickiness"   -> (t26Stickiness _),
    "o9_zscore_outliers" -> (o9ZscoreOutliers _),
    "w10_sliding_window" -> (w10SlidingWindow _)
  )

  def oracles: Map[String, String] = Map(
    "o11_mad_outliers" ->
      """WITH b AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT event_type, CAST(median(2 * vc) AS BIGINT) AS med2
        |      FROM b GROUP BY 1),
        |j AS (SELECT b.event_id, b.event_type, b.vc, m.med2
        |      FROM b JOIN m USING (event_type)),
        |md AS (SELECT event_type,
        |         CAST(2 * median(abs(2 * vc - med2)) AS BIGINT) AS mad4
        |       FROM j GROUP BY 1)
        |SELECT j.event_id, j.event_type, j.vc AS value_c, j.med2,
        |  md.mad4, CAST(2 * abs(2 * j.vc - j.med2) AS BIGINT) AS dev4
        |FROM j JOIN md USING (event_type)
        |WHERE 2 * abs(2 * j.vc - j.med2) > 3 * md.mad4
        |ORDER BY j.event_type, j.event_id""".stripMargin,
    "w16_rolling_distinct" ->
      """WITH g AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day, event_type
        |  FROM events),
        |d AS (SELECT DISTINCT user_id, day FROM g)
        |SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT g.event_type) AS BIGINT) AS n_types_7d
        |FROM d JOIN g ON d.user_id = g.user_id
        |  AND g.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.user_id, d.day
        |ORDER BY d.user_id, day""".stripMargin,
    "w15_dow_baseline" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |dowd AS (
        |  SELECT event_type, day, n,
        |    CAST(datediff('day', DATE '1970-01-01', day) % 7 AS INTEGER)
        |      AS dow
        |  FROM daily),
        |base AS (
        |  SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(count(*) AS BIGINT) AS dn
        |  FROM dowd GROUP BY 1, 2)
        |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.dow,
        |  d.n, CAST(d.n * 10000 * b.dn // b.tn AS BIGINT) AS dev_bp
        |FROM dowd d JOIN base b
        |  ON d.event_type = b.event_type AND d.dow = b.dow
        |ORDER BY d.event_type, day""".stripMargin,
    "w14_streaks" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    datediff('day', DATE '1970-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM ud),
        |runs AS (
        |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len,
        |    min(day) AS s, max(day) AS e
        |  FROM isl GROUP BY 1, 2),
        |best AS (
        |  SELECT user_id, len, s, e,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, s) AS rn
        |  FROM runs)
        |SELECT user_id, len AS best_streak,
        |  strftime(s, '%Y-%m-%d') AS streak_start,
        |  strftime(e, '%Y-%m-%d') AS streak_end
        |FROM best WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "w13_ewma" ->
      """WITH g AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS vu
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, vu,
        |  128 * vu
        |  + 64 * COALESCE(lag(vu, 1) OVER u, 0)
        |  + 32 * COALESCE(lag(vu, 2) OVER u, 0)
        |  + 16 * COALESCE(lag(vu, 3) OVER u, 0)
        |  +  8 * COALESCE(lag(vu, 4) OVER u, 0)
        |  +  4 * COALESCE(lag(vu, 5) OVER u, 0)
        |  +  2 * COALESCE(lag(vu, 6) OVER u, 0)
        |  +      COALESCE(lag(vu, 7) OVER u, 0) AS ewma_x128
        |FROM g WINDOW u AS (PARTITION BY user_id ORDER BY day)
        |ORDER BY user_id, day""".stripMargin,
    "w12_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(n * 10000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |    AS share_bp
        |FROM c ORDER BY prev_type, event_type""".stripMargin,
    "t26_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('day', ts) AS DATE) AS day
        |            FROM events),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
        |        FROM ud GROUP BY day),
        |cover AS (SELECT DISTINCT user_id, day + CAST(i AS INT) AS day
        |          FROM ud, range(7) r(i)),
        |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
        |        FROM cover GROUP BY day)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
        |  d.dau * 10000 // w.wau AS stickiness_bp
        |FROM dau d JOIN wau w ON d.day = w.day ORDER BY day""".stripMargin,
    "t24_retention" ->
      """WITH uw AS (
        |  SELECT user_id, date_trunc('week', ts) AS w, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |), c AS (
        |  SELECT user_id, w, min(w) OVER (PARTITION BY user_id) AS cw FROM uw)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', cw, w) / 7 AS INTEGER) AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM c GROUP BY cw, week_offset ORDER BY cohort, week_offset""".stripMargin,
    "t25_interpolate" ->
      """WITH k AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    COUNT(*) AS cnt,
        |    SUM(CAST(floor(value * 1000000) AS BIGINT)) AS sum_u
        |  FROM events GROUP BY 1, 2
        |), kv AS (
        |  SELECT event_type, h, CAST(sum_u AS DOUBLE) / cnt AS v FROM k
        |), grid AS (
        |  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
        |  FROM (SELECT event_type, min(h) AS mn, max(h) AS mx FROM kv GROUP BY 1)
        |), m AS (
        |  SELECT g.event_type, g.h, kv.v,
        |    CAST(epoch(g.h) / 3600 AS BIGINT) AS hn
        |  FROM grid g LEFT JOIN kv ON g.event_type = kv.event_type AND g.h = kv.h
        |), f AS (
        |  SELECT event_type, h, v, hn,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY hn
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
        |    last_value(CASE WHEN v IS NOT NULL THEN hn END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY hn
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hp,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY hn
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
        |    first_value(CASE WHEN v IS NOT NULL THEN hn END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY hn
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hnx
        |  FROM m)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M') AS hour,
        |  v IS NULL AS interp,
        |  CAST(floor(CASE WHEN v IS NOT NULL THEN v
        |    ELSE vp + (vn - vp) * (CAST(hn - hp AS DOUBLE) / (hnx - hp))
        |    END) AS BIGINT) AS value_u
        |FROM f ORDER BY event_type, hour""".stripMargin,
    "o9_zscore_outliers" ->
      """WITH b AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS vc FROM events
        |), m AS (
        |  SELECT event_type,
        |    CAST(SUM(vc) AS DOUBLE) / COUNT(*) AS mean,
        |    sqrt(CAST(SUM(vc * vc) AS DOUBLE) / COUNT(*)
        |      - (CAST(SUM(vc) AS DOUBLE) / COUNT(*))
        |        * (CAST(SUM(vc) AS DOUBLE) / COUNT(*))) AS std
        |  FROM b GROUP BY 1)
        |SELECT b.event_id, b.event_type, b.vc AS value_c,
        |  CAST(floor((CAST(b.vc AS DOUBLE) - m.mean) / m.std * 10000) AS BIGINT)
        |    AS z_bp
        |FROM b JOIN m ON b.event_type = m.event_type
        |WHERE abs((CAST(b.vc AS DOUBLE) - m.mean) / m.std) > 2.5
        |ORDER BY b.event_type, b.event_id""".stripMargin,
    "w10_sliding_window" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(vu) AS BIGINT) AS sum_u
        |FROM (
        |  SELECT unnest([date_trunc('hour', ts),
        |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
        |    event_type, CAST(floor(value * 1000000) AS BIGINT) AS vu
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin
  )
}
