package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables._
import graft.ops.Formats

/** Batch-equivalent forms of the streaming transformations, with DuckDB
  * oracles — the same functions [[Streams]] runs on unbounded input
  * (`tumblingAgg`, `asTickJson`'s expression) applied to the `events`
  * table. This is how the correctness gate covers §2.9 semantics: the
  * plan is identical modulo the watermark node.
  */
object StreamQueries {

  /** Watermarked tumbling-window agg (T1→T2 composition) on batch
    * input: 1-hour windows over event time. Decimal-cast sum keeps the
    * cross-engine result independent of parallel summation order.
    */
  def st1TumblingAgg(s: SparkSession, d: String): DataFrame =
    Streams.tumblingAgg(events(s, d), "ts", "value", "1 hour",
        stream = false)
      // string-encode the window start: parquet µs vs pandas ns dtype
      // noise would fail the driver's dtype compare on a raw timestamp
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("window_start")

  /** T1's record shape (K5/§2.8 `json.dumps({timestamp, price})`) as a
    * batch projection: exercises `Formats.tickJson` + `tsString`
    * (r1 verdict: both previously had no oracle coverage). Price is
    * floor'd to integer centavos — double→JSON-number formatting is not
    * portable across engines, integers are.
    */
  def st2TickJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        Formats.tickJson(
          Formats.tsString(col("ts")),
          floor(col("value") * 100).cast("long")).as("tick"))
      .orderBy("event_id")

  /** Native session-window agg ([[Streams.sessionAgg]]) on batch input —
    * same 1-hour gap as w4's lag/cumsum sessionizer, so the DuckDB
    * lag/cumsum oracle here doubles as an equivalence proof between the
    * two sessionization forms. Timestamps string-encoded (dtype note on
    * st1).
    */
  def st3SessionAgg(s: SparkSession, d: String): DataFrame =
    Streams.sessionAgg(events(s, d), "ts", "user_id", "1 hour",
        stream = false)
      .select(col("user_id"),
        date_format(col("sess_start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(col("sess_end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        col("n_events"))
      .orderBy("user_id", "sess_start")

  /** Hopping-window twin of st1 ([[Streams.hopAgg]], 2 h windows
    * sliding by 1 h — every event lands in exactly two windows) on
    * batch input, promoting the previously sbt-only hop path to a
    * hash-gated oracle query (the d13 precedent). Same decimal-sum and
    * string-encoded-start determinism as st1; the DuckDB oracle
    * generates each event's two member windows explicitly
    * (time_bucket − k·slide, k ∈ {0, 1}) — both engines align windows
    * to the epoch, so the starts agree exactly.
    */
  def st4HopAgg(s: SparkSession, d: String): DataFrame =
    Streams.hopAgg(events(s, d), "ts", "value",
        size = "2 hours", slide = "1 hour", stream = false)
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("window_start")

  /** Batch twin of the stream-stream interval join
    * ([[Streams.intervalJoin]], `stream = false` — the IDENTICAL join
    * expression the streaming form runs, minus the watermark nodes):
    * purchases within one hour AFTER a click by the same user, the
    * attribution shape whose bounded-state streaming form StreamScale
    * measures as sj1. Promotes the family's last sbt-only member to a
    * hash-gated oracle query. Interval bounds are INCLUSIVE on both
    * ends (`>= c_ts`, `<= c_ts + 1 h`) — pinned here and in the oracle.
    * Amounts are floor'd to integer centavos (portable across engines
    * where raw-double formatting is not); event ids carried on both
    * sides make the sort total.
    *
    * Scale shape: an equi-join on `user_id` with the time predicate as
    * a join residual — one key-partitioned shuffle, never a time-cross.
    */
  def sj1IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("buy_id"), col("value").as("amount"))
    Streams.intervalJoin(clicks, buys, "c_user", "b_user", "c_ts", "b_ts",
        beforeSec = 0, afterSec = 3600, stream = false)
      .select(col("c_user").as("user_id"), col("click_id"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("buy_id"),
        date_format(col("b_ts"), "yyyy-MM-dd HH:mm:ss").as("buy_ts"),
        floor(col("amount") * 100).cast("long").as("amount_cents"))
      .orderBy("user_id", "click_id", "buy_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_tumbling_agg" -> (st1TumblingAgg _),
    "st2_tick_json"    -> (st2TickJson _),
    "st3_session_agg"  -> (st3SessionAgg _),
    "st4_hop_agg"      -> (st4HopAgg _),
    "sj1_interval_join" -> (sj1IntervalJoin _),
  )

  def oracles: Map[String, String] = Map(
    "sj1_interval_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  b.event_id AS buy_id,
        |  strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS buy_ts,
        |  CAST(floor(b.value * 100) AS BIGINT) AS amount_cents
        |FROM events c JOIN events b
        |  ON c.user_id = b.user_id
        | AND c.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY user_id, click_id, buy_id""".stripMargin,
    "st4_hop_agg" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(count(*) AS BIGINT) AS n_ticks,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour' AS ws,
        |    value
        |  FROM events CROSS JOIN (VALUES (0), (1)) t(k))
        |GROUP BY 1 ORDER BY window_start""".stripMargin,
    "st1_tumbling_agg" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(count(*) AS BIGINT) AS n_ticks,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,
    "st2_tick_json" ->
      """SELECT event_id,
        |  '{"timestamp":"' || strftime(ts, '%Y-%m-%d %H:%M:%S') ||
        |  '","price":' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) || '}'
        |  AS tick
        |FROM events ORDER BY event_id""".stripMargin,
    // session_window merge rule (pinned empirically in StreamingSpec):
    // an event at EXACTLY the previous session's end still extends it —
    // new session only when diff > gap STRICTLY (same rule as w4)
    "st3_session_agg" ->
      """WITH l AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events
        |), x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |      OR epoch_us(ts) - epoch_us(prev) > 3600000000 THEN 1
        |      ELSE 0 END AS ns
        |  FROM l
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  strftime(max(ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS sess_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
  )
}
