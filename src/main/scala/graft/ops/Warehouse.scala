package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.Tables._

/** Warehouse-maintenance operators: the dimension/changelog machinery an
  * ETL deployment runs around its analytical queries (reference context:
  * the B3 pipeline maintains refined tables by full rewrite —
  * ETL_glue_pregao_B3.json's job reruns — which stops working the moment
  * a dimension needs history or a feed turns into a changelog):
  *
  *   - SCD Type 2 history build (`scdType2` / l1): an event-sourced
  *     attribute stream becomes interval rows `[valid_from, valid_to)`
  *     with an `is_current` flag.
  *   - CDC apply (`cdcApply` / l2): a changelog of I/U/D ops collapses
  *     to current state — latest op per key wins, deletes drop the key.
  *     The batch twin of `Lake.upsertByKey` with delete semantics.
  *   - Column profiling (`profile` / v1): per-column null/distinct/range
  *     stats in ONE pass — the scan that drives layout and skew choices.
  *   - Constraint checks (`checkConstraints` / v2, `quarantine`): named
  *     row predicates audited in one pass; quarantine splits violating
  *     rows out instead of failing the load.
  *
  * Cross-engine determinism: timestamps surface as epoch-MICROSECOND
  * bigints (`unix_micros` ≡ DuckDB `epoch_us`; `Tables.events` already
  * normalized whatever encoding the file shipped with — nanos-long, NTZ
  * or LTZ micros — to µs TimestampType), money/value doubles as floor'd
  * fixed-point bigints,
  * and every window order carries `event_id` as a total tiebreaker.
  */
object Warehouse {

  // ---------------------------------------------------------------- SCD2

  /** Build an SCD Type 2 interval table from an append-only attribute
    * observation stream: one output row per CHANGE of `attr`, valid from
    * its first observation until the next change (exclusive), open-ended
    * on the current value.
    *
    * Scale shape (100 TB changelog): both windows partition by the
    * entity key, so the whole build is ONE hash exchange on `key` —
    * the change-detect lag, the filter, and the validity lead all run
    * inside the same sort order (Catalyst plans one Sort under one
    * Exchange; asserted in `WarehouseSpec`). No joins, no broadcast,
    * no driver state; entity count can grow without bound because
    * state per task is one window frame row.
    *
    * `tsCol` must be a total order per key — pass a tiebreaker column
    * (`tieCol`) to break exact-timestamp ties deterministically.
    */
  def scdType2(df: DataFrame, key: Column, attr: Column, tsCol: Column,
      tieCol: Column): DataFrame = {
    val byTime = Window.partitionBy(key).orderBy(tsCol, tieCol)
    val changes = df
      .withColumn("__prev", lag(attr, 1).over(byTime))
      .filter(col("__prev").isNull || col("__prev") =!= attr)
      .select(key.as("key"), attr.as("attr"), tsCol.as("valid_from"),
        tieCol.as("__tie"))
    val byFrom = Window.partitionBy(col("key"))
      .orderBy(col("valid_from"), col("__tie"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .drop("__tie")
  }

  /** l1: SCD2 over the event log — each user's `event_type` as the
    * tracked attribute; epoch-µs validity bounds.
    */
  def l1Scd2(s: SparkSession, d: String): DataFrame =
    scdType2(
      events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us")),
      col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .select(col("key").as("user_id"), col("attr"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("user_id", "valid_from", "attr")

  // ----------------------------------------------------------- CDC apply

  /** Collapse a changelog to current state: for each key keep the latest
    * op by `(tsCol, tieCol)`; a latest op in `deleteOps` removes the key.
    *
    * Scale shape: one hash exchange on `key` for the row_number window;
    * the filter is post-window, no second shuffle. This is max_by with
    * a tombstone — at 100 TB the changelog streams through one exchange
    * and only surviving current rows come out. Intra-batch duplicate
    * (key, ts, tie) triples can't happen when `tieCol` is unique
    * (event_id here); the window order is total, so re-runs are
    * bit-identical.
    */
  def cdcApply(df: DataFrame, key: Column, op: Column, tsCol: Column,
      tieCol: Column, deleteOps: Set[String]): DataFrame = {
    val latest = Window.partitionBy(key).orderBy(tsCol.desc, tieCol.desc)
    df.withColumn("__rn", row_number().over(latest))
      .filter(col("__rn") === 1 && !op.isInCollection(deleteOps))
      .drop("__rn")
  }

  /** l2: events as a synthetic changelog — `error` is a delete tombstone,
    * `signup` an insert, the rest updates of the user's `value`.
    */
  def l2CdcApply(s: SparkSession, d: String): DataFrame = {
    val log = events(s, d).select(
      col("user_id"), col("event_id"),
      when(col("event_type") === "error", "D")
        .when(col("event_type") === "signup", "I")
        .otherwise("U").as("op"),
      unix_micros(col("ts")).as("ts_us"),
      expr("cast(floor(value * 1000000) as bigint)").as("value_u"))
    cdcApply(log, col("user_id"), col("op"), col("ts_us"), col("event_id"),
        deleteOps = Set("D"))
      .select("user_id", "op", "value_u")
      .orderBy("user_id")
  }

  // ------------------------------------------------------------ Profiling

  /** v1: one-pass column profile of the fact table's numeric measures —
    * (column, null count, exact distinct count, fixed-point min/max).
    *
    * Scale shape: a single aggregation; the multi-`countDistinct` plans
    * one Expand (×4 row multiplier, one branch per distinct column)
    * feeding ONE partial-aggregable exchange — no per-column scans, no
    * driver loop over columns. At 100 TB swap `countDistinct` for
    * `approx_count_distinct` and the Expand collapses to a plain
    * single-pass agg (HLL registers merge associatively); the exact form
    * is kept here because the oracle hash-checks it. min/max floor to
    * cents AFTER aggregating (floor is monotone, so floor(min) ≡
    * min(floor) — but one floor beats N).
    */
  def v1Profile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        expr(s"cast(floor(min($c) * 100) as bigint)").as(s"${c}__min"),
        expr(s"cast(floor(max($c) * 100) as bigint)").as(s"${c}__max"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
    lineitem(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) " +
        "as (col_name, n_null, n_distinct, min_c, max_c)"))
      .orderBy("col_name")
  }

  // ------------------------------------------------------ Constraint audit

  /** Named row-level constraints for the audit/quarantine pair. */
  final case class Constraint(name: String, violated: Column)

  /** The orders-feed ruleset: three hard schema invariants (expected to
    * hold) and two distribution guards (expected to fire) — an audit
    * whose output is all-zeros is indistinguishable from one that never
    * ran.
    */
  private def orderRules: Seq[Constraint] = Seq(
    Constraint("null_custkey", col("o_custkey").isNull),
    Constraint("nonpositive_price", col("o_totalprice") <= 0),
    Constraint("bad_status", !col("o_orderstatus").isInCollection(
      Set("O", "F", "P"))),
    Constraint("price_above_450k", col("o_totalprice") > 450000),
    Constraint("stale_pre_1996",
      col("o_orderdate") < lit("1996-01-01").cast("timestamp")))

  /** v2: audit — per rule, how many rows violate it, over the total.
    *
    * Scale shape: every rule is a conditional-sum branch of ONE
    * aggregation over ONE scan (no per-rule passes); output is
    * rule-count rows regardless of input size. The stack unpivot runs
    * on the single agg row — driver-side-tiny.
    */
  def v2Quarantine(s: SparkSession, d: String): DataFrame = {
    val rules = orderRules
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(r.violated.cast("long")).as(s"__r$i")
    } :+ count(lit(1)).as("__total")
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', __r$i, __total" }.mkString(", ")
    orders(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${rules.size}, $stackArgs) " +
        "as (rule, n_bad, n_rows)"))
      .orderBy("rule")
  }

  /** Split a load into (clean, quarantined-with-reasons) in one pass —
    * the load-time twin of the v2 audit. Quarantined rows carry the
    * array of violated rule names; both sides are lazy projections of
    * the same scan (Spark plans two scans unless the input is
    * checkpointed — at 100 TB, write `bad` first, then anti-filter, or
    * persist the rule bitmap; documented here, tested in sbt).
    */
  def quarantine(df: DataFrame, rules: Seq[Constraint])
      : (DataFrame, DataFrame) = {
    val reasons = array(rules.map(r =>
      when(r.violated, lit(r.name))): _*)
    val tagged = df.withColumn("__reasons",
      filter(reasons, x => x.isNotNull))
    (tagged.filter(size(col("__reasons")) === 0).drop("__reasons"),
      tagged.filter(size(col("__reasons")) > 0)
        .withColumnRenamed("__reasons", "violations"))
  }

  /** Orders ruleset exposed for the sbt quarantine-split test. */
  private[graft] def orderRulesForTest: Seq[Constraint] = orderRules

  // ------------------------------------------------------ Integrity audit

  /** One relationship's referential-integrity audit: child row count,
    * orphan children (no parent), childless parents. Anti joins, not
    * outer-join-count — the anti join stops at first match and carries
    * no payload columns.
    */
  private def relAudit(rel: String, child: DataFrame, ck: String,
      parent: DataFrame, pk: String): DataFrame = {
    val nChild = child.agg(count(lit(1)).as("n_child"))
    val nOrphan = child.join(parent, child(ck) === parent(pk), "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    val nChildless = parent.join(child, parent(pk) === child(ck), "left_anti")
      .agg(count(lit(1)).as("n_childless"))
    nChild.crossJoin(nOrphan).crossJoin(nChildless)
      .select(lit(rel).as("rel"), col("n_child"), col("n_orphan"),
        col("n_childless"))
  }

  /** v3: referential-integrity audit across the lake's FK edges — the
    * load-gate a warehouse runs before publishing a snapshot (the
    * reference's refined-zone rewrite assumes integrity; this measures
    * it). Cross joins here are 1-row × 1-row aggregates — constant.
    *
    * Scale shape: each audit is two anti joins + count. The child-side
    * anti join shuffles each table once on its FK (or broadcasts the
    * parent's key column when it fits — AQE decides; key-only
    * projection keeps the build side minimal either way). Counts are
    * partial-aggregated; nothing wide survives the joins.
    */
  def v3Integrity(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).select("c_custkey")
    Seq(
      relAudit("events->customer",
        events(s, d).select("user_id"), "user_id", cust, "c_custkey"),
      relAudit("lineitem->orders",
        lineitem(s, d).select("l_orderkey"), "l_orderkey",
        orders(s, d).select("o_orderkey"), "o_orderkey"),
      relAudit("orders->customer",
        orders(s, d).select("o_custkey"), "o_custkey", cust, "c_custkey"))
      .reduce(_.unionAll(_))
      .orderBy("rel")
  }

  // ---------------------------------------------------------- k-anonymity

  /** k-anonymity generalization with a RESIDUAL ladder: every row's
    * quasi-identifier tuple is generalized just far enough that at
    * least `k` PUBLISHED rows share it. The ladder suppresses quasi
    * columns from the RIGHT (list order = most-specific-last): level 0
    * keeps all of them, level i replaces the last i with `"*"`, level
    * n suppresses everything (Sweeney 2002; Samarati 2001).
    *
    * "Residual" is the load-bearing word: level i's cell counts include
    * ONLY rows still unpublished after level i−1 — counting all rows
    * (plain full-domain recoding) lets a published coarse cell hold
    * fewer than k rows once its siblings publish at a finer level,
    * silently breaking the k guarantee (caught by this repo's own
    * spec). With residual counts every published cell at level < n
    * provably covers ≥ k rows; the level-n remainder is fully
    * suppressed (`"*"` everywhere — zero quasi bits, nothing to
    * isolate).
    *
    * Scale shape (100 TB): the raw table is scanned ONCE into level-0
    * cells (one partial-aggregable count at the finest grain — the only
    * data-sized exchange). The residual cascade re-aggregates the CELL
    * relation, never the rows, so the ladder costs |cells| per level,
    * and the per-row assignment is one join against the cell→level map
    * on the full quasi key — broadcast-sized whenever the quasi domain
    * is bounded (the point of quasi-identifiers). The `"*"` projection
    * is a codegen'd `when` chain.
    *
    * Quasi columns must be string-typed (the `"*"` sentinel shares the
    * column) and NON-NULL (cells group with plain equality; encode
    * missing as a value first).
    */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    val n = quasi.length
    val cells0 = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__c0"))
    // residual cascade over the cell relation: `rem` = finest-grain
    // cells whose rows are still unpublished entering level i
    var rem = cells0.filter(col("__c0") < k)
    val publishable = (1 until n).map { i =>
      val keys = quasi.take(n - i)
      val li = rem.groupBy(keys.map(col): _*).agg(sum("__c0").as("__ni"))
      val pub = li.filter(col("__ni") >= k)
        .select(keys.map(col): _*).withColumn(s"__p$i", lit(1))
      rem = rem.join(li.filter(col("__ni") < k).select(keys.map(col): _*),
        keys)
      (keys, pub)
    }
    var ladder = cells0
    publishable.foreach { case (keys, pub) =>
      ladder = ladder.join(pub, keys, "left")
    }
    val levelOf = (1 until n).foldRight(lit(n): Column) { (i, coarser) =>
      when(col(s"__p$i") === 1, lit(i)).otherwise(coarser)
    }
    val cellLevel = ladder.select(quasi.map(col) :+
      when(col("__c0") >= k, lit(0)).otherwise(levelOf)
        .cast("int").as("gen_level"): _*)
    val keep = df.columns.filterNot(quasi.contains).toSeq
    val genCols = quasi.zipWithIndex.map { case (q, idx) =>
      // the column at position idx survives levels 0 .. n-1-idx
      when(col("gen_level") <= lit(n - 1 - idx), col(q))
        .otherwise(lit("*")).as(s"${q}_g")
    }
    df.join(cellLevel, quasi)
      .select(keep.map(col) ++ (col("gen_level") +: genCols): _*)
  }

  /** v4: k-anonymity over customer quasi-identifiers (nation, market
    * segment, $1000 account-balance band), k = 5. The band quantizes
    * on integer cents with a positive offset so floor division agrees
    * cross-engine (Spark `div` truncates toward zero, DuckDB `//`
    * floors — they only coincide on non-negatives).
    */
  def v4KAnonymity(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(
      col("c_custkey"),
      col("c_nationkey").cast("string").as("nation"),
      col("c_mktsegment").as("segment"),
      expr("CAST((CAST(round(c_acctbal * CAST(100 AS DOUBLE)) AS BIGINT)" +
        " + 1000000) div 100000 AS STRING)").as("band"))
    kAnonymize(c, Seq("nation", "segment", "band"), k = 5L)
      .orderBy("c_custkey")
  }

  /** Algebraic (count, sum) aggregate state per key — the partial an
    * incremental maintenance step produces, stores, and merges.
    */
  def aggState(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("n"), sum(col(value)).as("s"))

  /** Merge aggregate states: union + re-sum. count/sum are algebraic —
    * merging partials commutes with aggregating the union of their
    * inputs, which is the identity l3's oracle checks.
    */
  def mergeStates(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).groupBy(key)
      .agg(sum("n").as("n"), sum("s").as("s"))

  /** l3: incremental materialized-aggregate maintenance — the direct
    * cure for the reference's full-rescan posture (job bookmark
    * DISABLED, ETL_glue_pregao_B3.json:34: every Glue run re-reads all
    * history). Keep the per-key (count, sum) STATE from history; each
    * new batch aggregates ONLY its own rows and merges states. The
    * query proves the identity end-to-end: base state (orders before
    * 2001-01-01) + delta batch (the rest) merged equals the full
    * recompute the DuckDB oracle runs over all of orders.
    *
    * Scale shape (100 TB): steady-state cost is |delta| + |state| —
    * the delta aggregates map-side to its key partials, the merge
    * shuffles two keyset-sized relations on the SAME key; history is
    * never rescanned. The state table persists via the lake's K2/K6
    * surface (or `upsertByKey` keyed on the group key); derived
    * measures (avg = s/n) come out of the state at read time, which is
    * why only algebraic aggregates (count/sum/min/max) belong in it —
    * holistic ones (exact percentile) need the a6/a5 sketch surface.
    */
  def l3IncrementalAgg(s: SparkSession, d: String): DataFrame = {
    // integer-cents state: the sum is exact, so the merged state is
    // BIT-identical to the full recompute (and the derived average is
    // integer floor division — no round-tie exposure cross-engine)
    val o = orders(s, d).withColumn("cents",
      expr("CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)"))
    val cutoff = to_timestamp(lit("2001-01-01"))
    val base  = o.filter(col("o_orderdate") <  cutoff)
    val delta = o.filter(col("o_orderdate") >= cutoff)
    mergeStates(
        aggState(base, "o_custkey", "cents"),
        aggState(delta, "o_custkey", "cents"),
        "o_custkey")
      .select(col("o_custkey"),
        col("n").cast("long").as("n_orders"),
        round(col("s").cast("double") / lit(100), 2).as("total_price"),
        expr("s div n").as("avg_price_cents"))
      .orderBy("o_custkey")
  }

  /** l4: incremental COUNT DISTINCT via mergeable HLL sketch state —
    * l3's companion for the one aggregate that is NOT algebraic. A
    * per-day DataSketches HLL of user_id is the stored state; each new
    * batch sketches only its own rows and `hll_union_agg` merges —
    * distinct users over any horizon without ever rescanning history
    * (the reference's full-rescan posture again,
    * ETL_glue_pregao_B3.json:34; exact distinct does not decompose,
    * which is why warehouses persist sketches).
    *
    * Gate shape: the a6 within-bounds pattern — output carries the
    * EXACT count (DuckDB recomputes it) plus a flag that the merged
    * estimate lands within ±5%. lgConfigK=14 ⇒ ~0.8% RSE, so the 5%
    * bound is >6σ on the pinned testdata (cannot flake); the sketch is
    * 16 KB per day-group — partial-aggregable, broadcast-weight state.
    */
  def l4IncrementalDistinct(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
      col("user_id"))
    def sketch(df: DataFrame): DataFrame =
      df.groupBy("day").agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    // batch split CROSSES the day grain (user parity, not a day
    // boundary) so every day's state genuinely merges two sketches —
    // a day-bounded split would union one sketch per day and never
    // exercise mergeability
    val base  = e.filter(col("user_id") % 2 === 0)
    val delta = e.filter(col("user_id") % 2 =!= 0)
    val merged = sketch(base).unionByName(sketch(delta))
      .groupBy("day").agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
    val exact = e.distinct().groupBy("day")
      .agg(count(lit(1)).as("exact_users"))
    merged.join(exact, "day")
      .select(col("day"), col("exact_users"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_users")) /
          col("exact_users") <= 0.05).cast("int").as("within_bounds"))
      .orderBy("day")
  }

  /** l5: incremental QUANTILE state via mergeable KLL sketches — the
    * order-statistics companion to l3 (algebraic) and l4 (distinct).
    * Per-month KLL sketch of order price cents is the stored state;
    * batches sketch only their own rows and `kll_merge_agg_bigint`
    * combines, so any horizon's median/p99 comes out of state without
    * rescanning history. The batch split crosses the month grain
    * (orderkey parity) so every month's state merges two sketches.
    *
    * k = 800 ⇒ months below 800 rows sit in the sketch's exact regime
    * (no sampling), and beyond it the KLL normalized rank error at
    * k=800 is ~0.4% — the gate checks the estimate's EXACT rank lands
    * within ±(5% + 1/n) of the median. The 1/n term is rank
    * DISCRETIZATION, not sketch error: with n rows the nearest
    * achievable rank to 0.5 under the inclusive-quantile convention
    * is up to 1/n above it (a 1-row month's only rank is 100%), so a
    * fixed bound fails tiny groups no sketch could satisfy. Gate
    * shape: a6/l4 pattern — DuckDB recomputes the exact row counts;
    * the rank check is Spark-side arithmetic on exact integers.
    *
    * Scale shape (100 TB): two narrow scans (sketch partials are
    * map-side combined; the rank gate re-aggregates the same
    * month-keyed exchange); state is ≤ a few KB per month-group.
    */
  def l5IncrementalQuantile(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(
      date_format(col("o_orderdate"), "yyyy-MM").as("month"),
      col("o_orderkey"),
      expr("CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)")
        .as("cents"))
    def sketch(df: DataFrame): DataFrame = df.groupBy("month")
      .agg(expr("kll_sketch_agg_bigint(cents, 800)").as("sk"))
    val merged = sketch(o.filter(col("o_orderkey") % 2 === 0))
      .unionByName(sketch(o.filter(col("o_orderkey") % 2 =!= 0)))
      .groupBy("month").agg(expr("kll_merge_agg_bigint(sk, 800)").as("sk"))
    val est = merged.select(col("month"),
      expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("est"))
    // est is months-count rows BY CONSTRUCTION (one per group) — broadcast
    // explicitly rather than trusting AQE's stats through the sketch-agg
    // exchange: at the 100× tier AQE planned this as a sort-merge join and
    // shuffled the whole fact on `month` (489 MB, bexp 1.26 → the one
    // relational-family shuffle flag in SCALE100); with the broadcast the
    // fact-side groupBy partial-aggregates map-side and the exchange
    // carries only (month, partial-counts) rows.
    o.join(broadcast(est), "month")
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("cents") <= col("est"), 1L).otherwise(0L)).as("n_le"))
      .select(col("month"), col("n_orders"),
        (abs(col("n_le") * 10000L / col("n_orders") - 5000L) <=
          lit(500L) + lit(10000L) / col("n_orders"))
          .cast("int").as("within_bounds"))
      .orderBy("month")
  }

  /** l6: audience-overlap matrix via Theta-sketch SET ALGEBRA — for
    * every pair of event types, how many distinct users did BOTH.
    * Theta sketches support intersection/difference where HLL only
    * unions, which is why warehouses persist them for segment-overlap
    * analytics: per-segment sketches are tiny mergeable state, and any
    * pairwise (or k-way) overlap is computed from state alone.
    *
    * The exact leg (distinct-grain self-join) exists here as the
    * oracle gate; at 100 TB you publish the sketch estimates and skip
    * it. Scale shape: the log collapses ONCE to the (user, type)
    * grain; sketches partial-aggregate per type; the intersection runs
    * on the k-row sketch relation (k = event types), k²/2 pairs of
    * in-memory sketch ops — the log is never self-joined for the
    * estimate path. At testdata scale the per-type user sets sit below
    * the sketch's 4096-entry exact regime, so estimates are exact and
    * the ±5% gate cannot flake.
    */
  def l6OverlapMatrix(s: SparkSession, d: String): DataFrame = {
    val grain = events(s, d)
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
    val sk = grain.groupBy("t").agg(expr("theta_sketch_agg(u)").as("sk"))
    val est = sk.as("a").crossJoin(sk.as("b"))
      .filter(col("a.t") < col("b.t"))
      .select(col("a.t").as("type_a"), col("b.t").as("type_b"),
        expr("theta_sketch_estimate(theta_intersection(a.sk, b.sk))")
          .as("est"))
    val exact = grain.as("x")
      .join(grain.as("y"), col("x.u") === col("y.u") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    exact.join(est, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("exact_overlap"),
        (abs(col("est") - col("exact_overlap")) <=
          greatest(lit(1.0), col("exact_overlap") * 0.05))
          .cast("int").as("within_bounds"))
      .orderBy("type_a", "type_b")
  }

  /** Benford expected first-digit frequencies, log10(1 + 1/d) in ppm.
    * Exact-integer constants (they sum to 1 000 000), shared verbatim
    * with the DuckDB oracle — no transcendental evaluated at runtime.
    */
  private[graft] val BenfordPpm =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** v5: Benford first-digit profile of order totals — the classic
    * fabricated-data / unit-drift screen a profiling pass runs over any
    * organically-grown money column (multi-magnitude positive values):
    * observed first-significant-digit shares against log10(1+1/d).
    * A column that was uniformly generated, truncated, or re-scaled
    * shows up as a flat or shifted profile (this synthetic corpus
    * does — the test pins large deviations as in-band, not an error).
    *
    * Determinism: the digit comes from floor'd CENTS cast to a string
    * (both engines floor the identical double and print bigints the
    * same way — the t4 floor-not-round rule); shares are integer ppm
    * via bigint floor division; the Benford expectations are shared
    * integer literals, so no log10 is evaluated anywhere.
    *
    * Scale shape: one narrow projection + one partial-agg shuffle onto
    * a NINE-row key domain, then a broadcast of the one-row total (the
    * w11 re-aggregate rule — no window, no second scan). Scan-bound at
    * any corpus size.
    */
  def v5Benford(s: SparkSession, d: String): DataFrame = {
    val arr = s"array(${BenfordPpm.mkString("L, ")}L)"
    val digits = orders(s, d)
      .filter(col("o_totalprice") > 0)
      .select(expr(
        "CAST(substring(CAST(CAST(floor(o_totalprice * CAST(100 AS DOUBLE))" +
          " AS BIGINT) AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("share_ppm"),
        expr(s"element_at($arr, digit)").as("expected_ppm"),
        expr(s"abs(n * 1000000 div total - element_at($arr, digit))")
          .as("abs_dev_ppm"))
      .orderBy("digit")
  }

  // ------------------------------------------------- Incremental join view

  /** Delta-join maintenance rule: the view over (A ∪ ΔA) ⋈ (B ∪ ΔB)
    * equals V_old ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the distributivity of join
    * over disjoint union that every incremental view-maintenance engine
    * (Blakeley et al. 1986; DBSP) is built on. Exposed as a function of
    * the four legs so l7's oracle identity and the sbt spec both
    * exercise it.
    */
  def deltaJoinView(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, key: String): DataFrame =
    aOld.join(bOld, key)
      .unionByName(aDelta.join(bOld, key))
      .unionByName(aOld.join(bDelta, key))
      .unionByName(aDelta.join(bDelta, key))

  /** l7: incremental JOIN-view maintenance — l3's companion for the
    * other stateful warehouse artifact: a materialized join, kept
    * current without re-joining history against history. l3 maintains
    * aggregate STATE; l7 maintains a join VIEW: when a batch appends
    * ΔOrders and ΔCustomers, the view gains exactly
    * ΔO⋈C_old ∪ O_old⋈ΔC ∪ ΔO⋈ΔC — the old view rows are never
    * recomputed. The query proves the identity end-to-end: orders split
    * by date (history / new batch) and customers split by key parity
    * (existing / newly registered) are maintained through
    * [[deltaJoinView]], and the DuckDB oracle recomputes the full join
    * over all of both tables.
    *
    * Scale shape (100 TB): steady-state maintenance cost is the three
    * delta legs — each joins a BATCH-sized relation against state (or
    * another batch), so the per-batch price is |ΔA|·selectivity +
    * |ΔB|·selectivity, never |A⋈B|. With the state tables bucketed on
    * the join key (the [[graft.lake.IndexTables]] posture), the
    * Δ-against-state legs are broadcast joins when the delta fits (a
    * daily batch against a year of history) or bucket-local joins when
    * it doesn't; history⋈history is paid once at view creation. The
    * oracle-gated form here runs all four legs over the real tables —
    * the identity, not the economics, is what the hash pins.
    */
  def l7DeltaJoinView(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      expr("CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)")
        .as("cents"),
      col("o_orderdate"))
    val c = customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val cutoff = to_timestamp(lit("2001-01-01"))
    deltaJoinView(
        o.filter(col("o_orderdate") <  cutoff).withColumnRenamed("o_custkey", "k"),
        o.filter(col("o_orderdate") >= cutoff).withColumnRenamed("o_custkey", "k"),
        c.filter(col("c_custkey") % 2 === 0).withColumnRenamed("c_custkey", "k"),
        c.filter(col("c_custkey") % 2 =!= 0).withColumnRenamed("c_custkey", "k"),
        "k")
      .select(col("o_orderkey"), col("k").as("o_custkey"), col("cents"),
        col("c_mktsegment").as("segment"))
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------- Drift detection

  /** $50k price bands: integer cents div 5e6, non-negative by the v2
    * audit (price > 0 filter mirrors it), so Spark `div` and DuckDB `//`
    * agree (the v4 truncate-vs-floor rule).
    */
  private val DriftBandCents = 5000000L

  /** v6: distribution-DRIFT screen between two periods — per price
    * band, each period's share in ppm and the absolute share deviation.
    * The total-variation distance (Σ abs_dev/2) is the standard
    * train/serve or month-over-month drift alarm a data-quality pass
    * runs next to v1's profile and v5's Benford screen; per-band rows
    * (not just the scalar) show WHERE the mass moved. Everything is
    * integer ppm via bigint floor division — no log-likelihood (PSI's
    * ln) ever evaluated, so the output is bit-portable cross-engine.
    *
    * Scale shape: one narrow scan, one conditional partial-agg onto a
    * ~10-row band domain, then a broadcast of the one-row totals (the
    * v5 shape). Scan-bound at any corpus size; adding periods adds
    * conditional-sum branches, not passes.
    */
  def v6DriftTvd(s: SparkSession, d: String): DataFrame = {
    val cutoff = to_timestamp(lit("1998-01-01"))
    val banded = orders(s, d).filter(col("o_totalprice") > 0)
      .select(
        expr("CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)" +
          s" div $DriftBandCents").as("band"),
        (col("o_orderdate") < cutoff).cast("long").as("is_a"))
    val counts = banded.groupBy("band")
      .agg(sum(col("is_a")).as("n_a"), sum(lit(1L) - col("is_a")).as("n_b"))
    val totals = counts.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    // Empty-period guard (ADVICE r11): an all-one-period corpus makes a
    // divisor 0, where Spark `div` yields NULL but DuckDB `//` RAISES —
    // the operator and its oracle would fail asymmetrically. Both sides
    // now guard explicitly: a 0-total period emits NULL shares (and a
    // NULL deviation), the same "unknown, not zero" read in each engine.
    counts.crossJoin(broadcast(totals))
      .select(col("band"), col("n_a"), col("n_b"),
        expr("IF(ta = 0, NULL, n_a * 1000000 div ta)").as("share_a_ppm"),
        expr("IF(tb = 0, NULL, n_b * 1000000 div tb)").as("share_b_ppm"),
        expr("IF(ta = 0 OR tb = 0, NULL," +
          " abs(n_a * 1000000 div ta - n_b * 1000000 div tb))")
          .as("abs_dev_ppm"))
      .orderBy("band")
  }

  // ------------------- persisted warehouse state (r14 verdict #6) ------
  // l3/l4/l5/l7's incremental states were CALLER-MANAGED: the queries
  // prove the merge identities end-to-end, but nothing persisted the
  // states or kept them current when a nightly landed. These tables
  // give every stateful warehouse artifact the stamped-table + nightly
  // -leg treatment the index families already have:
  //
  //   whagg   (o_custkey, n, s)   l3's algebraic agg state — ADDITIVE
  //           (per-key sum merges on read), signs orders.parquet
  //   whkll   (month, sk)         l5's KLL quantile sketches —
  //           MERGEABLE (kll_merge_agg on read), signs orders.parquet
  //   whhll   (day, sk)           l4's HLL distinct sketches —
  //           MERGEABLE (hll_union_agg on read), signs events.parquet
  //   whjoin  (o_orderkey, k, cents, segment)  l7's materialized join
  //           view — ROW-DECOMPOSABLE under static dimensions (a delta
  //           of whole orders contributes exactly ΔO⋈C), signs the
  //           TIER directory (depends on orders + customer; the
  //           over-invalidation posture the graph artifacts use)
  //
  // Equivalence grain (WarehouseStateSpec): whagg and whjoin are EXACT
  // (integer state / plain rows — append ≡ rebuild bit-for-bit); the
  // sketch states are equivalent at their ESTIMATE grain — a sketch
  // built-then-merged is not byte-identical to one built in one pass
  // (compaction paths differ), which is why the l4/l5 queries gate on
  // bounds, and the spec pins the same gates THROUGH the append path.
  // Deletions: whagg retracts algebraically (negated deltas, the coadj
  // posture); sketches do NOT subtract — a retraction re-persists.

  private[graft] val AggStatePrefix = "whagg"
  private[graft] val KllStatePrefix = "whkll"
  private[graft] val HllStatePrefix = "whhll"
  private[graft] val JoinViewPrefix = "whjoin"
  private def ordersPath(d: String): String = s"$d/orders.parquet"
  private def eventsPath(d: String): String = s"$d/events.parquet"

  private def centsCol = expr(
    "CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)")

  /** l3's state relation of an explicit orders frame — the one body
    * builder and maintainer share (the coOrderWeightedFrom posture).
    */
  private[graft] def aggStateRelation(ord: DataFrame): DataFrame =
    aggState(ord.withColumn("cents", centsCol), "o_custkey", "cents")

  /** l5's sketch-state relation: per-month KLL of order price cents. */
  private[graft] def kllStateRelation(ord: DataFrame): DataFrame =
    ord.select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        centsCol.as("cents"))
      .groupBy("month")
      .agg(expr("kll_sketch_agg_bigint(cents, 800)").as("sk"))

  /** l4's sketch-state relation: per-day HLL of event user ids. The
    * frame must carry a NORMALIZED µs `ts` ([[graft.lake.Tables
    * .normalizeEventsTs]]) — the builder reads through Tables.events,
    * and increments must arrive at the same grain.
    */
  private[graft] def hllStateRelation(ev: DataFrame): DataFrame =
    ev.select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"), col("user_id"))
      .groupBy("day").agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))

  /** l7's view relation: orders ⋈ customer, projected. */
  private[graft] def joinViewRelation(ord: DataFrame,
      cust: DataFrame): DataFrame =
    ord.select(col("o_orderkey"), col("o_custkey").as("k"),
        centsCol.as("cents"))
      .join(cust.select(col("c_custkey").as("k"), col("c_mktsegment")
        .as("segment")), "k")
      .select("o_orderkey", "k", "cents", "segment")

  /** Persist all four warehouse-state tables for tier `d`. */
  def persistWarehouseState(s: SparkSession, d: String,
      buckets: Int = 32): Seq[String] = Seq(
    graft.lake.IndexTables.persist(s, aggStateRelation(orders(s, d)),
      AggStatePrefix, ordersPath(d), Seq("o_custkey"), buckets),
    graft.lake.IndexTables.persist(s, kllStateRelation(orders(s, d)),
      KllStatePrefix, ordersPath(d), Seq("month"), buckets = 1),
    graft.lake.IndexTables.persist(s, hllStateRelation(events(s, d)),
      HllStatePrefix, eventsPath(d), Seq("day"), buckets = 1),
    graft.lake.IndexTables.persist(s,
      joinViewRelation(orders(s, d), customer(s, d)),
      JoinViewPrefix, d, Seq("k"), buckets))

  /** Drop all four state tables for tier `d`, if any. */
  def dropWarehouseState(s: SparkSession, d: String): Unit = {
    graft.lake.IndexTables.drop(s, AggStatePrefix, ordersPath(d))
    graft.lake.IndexTables.drop(s, KllStatePrefix, ordersPath(d))
    graft.lake.IndexTables.drop(s, HllStatePrefix, eventsPath(d))
    graft.lake.IndexTables.drop(s, JoinViewPrefix, d)
  }

  /** The orders-signed states' stamp (whagg and whkll persist together;
    * one handle witnesses both) — read BEFORE an orders delta lands.
    */
  def aggStateStamp(s: SparkSession, d: String): Option[String] =
    graft.lake.IndexTables.stampOf(s, AggStatePrefix, ordersPath(d))

  /** The events-signed state's stamp — read BEFORE an events delta. */
  def hllStateStamp(s: SparkSession, d: String): Option[String] =
    graft.lake.IndexTables.stampOf(s, HllStatePrefix, eventsPath(d))

  /** The tier-signed join view's stamp — read BEFORE anything lands. */
  def joinViewStamp(s: SparkSession, d: String): Option[String] =
    graft.lake.IndexTables.stampOf(s, JoinViewPrefix, d)

  /** Orders-delta maintenance: append the delta's agg partials and
    * month sketches (merge-on-read restores the unique-key states).
    */
  def appendOrdersState(s: SparkSession, d: String, deltaOrders: DataFrame,
      prevSig: String): Seq[String] = Seq(
    graft.lake.IndexTables.appendIncrement(s, aggStateRelation(deltaOrders),
      AggStatePrefix, ordersPath(d), prevSig),
    graft.lake.IndexTables.appendIncrement(s, kllStateRelation(deltaOrders),
      KllStatePrefix, ordersPath(d), prevSig))

  /** Events-delta maintenance: append the delta's day sketches. */
  def appendEventsState(s: SparkSession, d: String, deltaEvents: DataFrame,
      prevSig: String): String =
    graft.lake.IndexTables.appendIncrement(s, hllStateRelation(deltaEvents),
      HllStatePrefix, eventsPath(d), prevSig)

  /** Join-view maintenance: a delta of whole orders contributes exactly
    * ΔO⋈C ([[deltaJoinView]] with ΔB = ∅ — dimensions static in a
    * nightly); append those rows. Customer deltas re-persist (the view
    * is not row-decomposable in the dimension).
    */
  def appendJoinView(s: SparkSession, d: String, deltaOrders: DataFrame,
      prevSig: String): String =
    graft.lake.IndexTables.appendIncrement(s,
      joinViewRelation(deltaOrders, customer(s, d)),
      JoinViewPrefix, d, prevSig)

  /** Served l3 state, merged to unique keys (the coadj merge-on-read
    * shape — clustered on the bucket key, exchange-free off the scan).
    */
  def servedAggState(s: SparkSession, d: String): Option[DataFrame] =
    graft.lake.IndexTables.serve(s, AggStatePrefix, ordersPath(d))
      .map(_.groupBy("o_custkey").agg(sum("n").as("n"), sum("s").as("s")))

  /** Served l5 state, sketches merged per month. */
  def servedKllState(s: SparkSession, d: String): Option[DataFrame] =
    graft.lake.IndexTables.serve(s, KllStatePrefix, ordersPath(d))
      .map(_.groupBy("month")
        .agg(expr("kll_merge_agg_bigint(sk, 800)").as("sk")))

  /** Served l4 state, sketches unioned per day. */
  def servedHllState(s: SparkSession, d: String): Option[DataFrame] =
    graft.lake.IndexTables.serve(s, HllStatePrefix, eventsPath(d))
      .map(_.groupBy("day")
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk")))

  /** Served l7 view (plain scan — appends land exactly the delta rows). */
  def servedJoinView(s: SparkSession, d: String): Option[DataFrame] =
    graft.lake.IndexTables.serve(s, JoinViewPrefix, d)

  // --------------------------------------------------------------- Queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l7_delta_join_view" -> (l7DeltaJoinView _),
    "v6_drift_tvd" -> (v6DriftTvd _),
    "v5_benford"   -> (v5Benford _),
    "l1_scd2"      -> (l1Scd2 _),
    "l3_incremental_agg" -> (l3IncrementalAgg _),
    "l4_incremental_distinct" -> (l4IncrementalDistinct _),
    "l5_incremental_quantile" -> (l5IncrementalQuantile _),
    "l6_overlap_matrix" -> (l6OverlapMatrix _),
    "l2_cdc_apply" -> (l2CdcApply _),
    "v1_profile"   -> (v1Profile _),
    "v2_quarantine" -> (v2Quarantine _),
    "v3_integrity" -> (v3Integrity _),
    "v4_kanonymity" -> (v4KAnonymity _))

  def oracles: Map[String, String] = Map(
    "l7_delta_join_view" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS cents,
        |  c_mktsegment AS segment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "v6_drift_tvd" ->
      s"""WITH b AS (
        |  SELECT CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)
        |           // $DriftBandCents AS band,
        |         CAST(o_orderdate < TIMESTAMP '1998-01-01' AS BIGINT) AS is_a
        |  FROM orders WHERE o_totalprice > 0),
        |c AS (
        |  SELECT band, CAST(sum(is_a) AS BIGINT) AS n_a,
        |         CAST(sum(1 - is_a) AS BIGINT) AS n_b
        |  FROM b GROUP BY band),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |             CAST(sum(n_b) AS BIGINT) AS tb FROM c)
        |SELECT band, n_a, n_b,
        |  CASE WHEN ta = 0 THEN NULL
        |    ELSE CAST(n_a * 1000000 // ta AS BIGINT) END AS share_a_ppm,
        |  CASE WHEN tb = 0 THEN NULL
        |    ELSE CAST(n_b * 1000000 // tb AS BIGINT) END AS share_b_ppm,
        |  CASE WHEN ta = 0 OR tb = 0 THEN NULL
        |    ELSE CAST(abs(n_a * 1000000 // ta - n_b * 1000000 // tb)
        |      AS BIGINT) END AS abs_dev_ppm
        |FROM c CROSS JOIN t ORDER BY band""".stripMargin,
    "v5_benford" ->
      """WITH v AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * CAST(100 AS DOUBLE))
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |e(digit, expected_ppm) AS (VALUES
        |  (1, CAST(301030 AS BIGINT)), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757))
        |SELECT c.digit, c.n,
        |  CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm,
        |  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
        |  CAST(abs(c.n * 1000000 // t.total - e.expected_ppm) AS BIGINT)
        |    AS abs_dev_ppm
        |FROM c JOIN e ON c.digit = e.digit CROSS JOIN t
        |ORDER BY c.digit""".stripMargin,
    "v4_kanonymity" ->
      """WITH r AS (
        |  SELECT c_custkey,
        |    CAST(c_nationkey AS VARCHAR) AS nation,
        |    c_mktsegment AS segment,
        |    CAST((CAST(round(c_acctbal * CAST(100 AS DOUBLE)) AS BIGINT)
        |          + 1000000) // 100000 AS VARCHAR) AS band
        |  FROM customer),
        |c0 AS (SELECT nation, segment, band, count(*) AS n0
        |       FROM r GROUP BY 1, 2, 3),
        |rem1 AS (SELECT * FROM c0 WHERE n0 < 5),
        |l1 AS (SELECT nation, segment, sum(n0) AS n1 FROM rem1 GROUP BY 1, 2),
        |rem2 AS (SELECT rem1.* FROM rem1
        |         JOIN l1 USING (nation, segment) WHERE n1 < 5),
        |l2 AS (SELECT nation, sum(n0) AS n2 FROM rem2 GROUP BY 1),
        |lvl AS (
        |  SELECT c0.nation, c0.segment, c0.band,
        |    CASE WHEN n0 >= 5 THEN 0
        |         WHEN l1.n1 >= 5 THEN 1
        |         WHEN l2.n2 >= 5 THEN 2 ELSE 3 END AS gen_level
        |  FROM c0 LEFT JOIN l1 USING (nation, segment)
        |          LEFT JOIN l2 USING (nation))
        |SELECT r.c_custkey, lvl.gen_level,
        |  CASE WHEN gen_level <= 2 THEN r.nation ELSE '*' END AS nation_g,
        |  CASE WHEN gen_level <= 1 THEN r.segment ELSE '*' END AS segment_g,
        |  CASE WHEN gen_level <= 0 THEN r.band ELSE '*' END AS band_g
        |FROM r JOIN lvl USING (nation, segment, band)
        |ORDER BY r.c_custkey""".stripMargin,
    "l4_incremental_distinct" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       1 AS within_bounds
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "l5_incremental_quantile" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       1 AS within_bounds
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "l6_overlap_matrix" ->
      """WITH g AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events)
        |SELECT x.t AS type_a, y.t AS type_b,
        |       CAST(count(*) AS BIGINT) AS exact_overlap,
        |       1 AS within_bounds
        |FROM g x JOIN g y ON x.u = y.u AND x.t < y.t
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,
    "l3_incremental_agg" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |         CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS total_price,
        |       CAST(sum(cents) // count(*) AS BIGINT) AS avg_price_cents
        |FROM c GROUP BY 1 ORDER BY o_custkey""".stripMargin,
    "l1_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events
        |), c AS (
        |  SELECT user_id, event_type AS attr, ts_us AS valid_from, event_id
        |  FROM e WHERE prev IS NULL OR prev <> event_type
        |)
        |SELECT user_id, attr, valid_from,
        |       lead(valid_from) OVER (PARTITION BY user_id
        |         ORDER BY valid_from, event_id) AS valid_to,
        |       CAST(lead(valid_from) OVER (PARTITION BY user_id
        |         ORDER BY valid_from, event_id) IS NULL AS INT) AS is_current
        |FROM c ORDER BY user_id, valid_from, attr""".stripMargin,
    "l2_cdc_apply" ->
      """WITH r AS (
        |  SELECT user_id,
        |         CASE WHEN event_type='error' THEN 'D'
        |              WHEN event_type='signup' THEN 'I'
        |              ELSE 'U' END AS op,
        |         CAST(floor(value * 1000000) AS BIGINT) AS value_u,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, op, value_u FROM r
        |WHERE rn = 1 AND op <> 'D' ORDER BY user_id""".stripMargin,
    "v1_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      .map(c => s"""SELECT '$c' AS col_name,
        | count(*) - count($c) AS n_null,
        | count(DISTINCT $c) AS n_distinct,
        | CAST(floor(min($c) * 100) AS BIGINT) AS min_c,
        | CAST(floor(max($c) * 100) AS BIGINT) AS max_c
        |FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "v2_quarantine" ->
      """SELECT rule, n_bad, n_rows FROM (
        |  SELECT 'null_custkey' AS rule,
        |    CAST(sum(CAST(o_custkey IS NULL AS BIGINT)) AS BIGINT) AS n_bad,
        |    count(*) AS n_rows FROM orders
        |  UNION ALL SELECT 'nonpositive_price',
        |    CAST(sum(CAST(o_totalprice <= 0 AS BIGINT)) AS BIGINT),
        |    count(*) FROM orders
        |  UNION ALL SELECT 'bad_status',
        |    CAST(sum(CAST(o_orderstatus NOT IN ('O','F','P') AS BIGINT))
        |      AS BIGINT), count(*) FROM orders
        |  UNION ALL SELECT 'price_above_450k',
        |    CAST(sum(CAST(o_totalprice > 450000 AS BIGINT)) AS BIGINT),
        |    count(*) FROM orders
        |  UNION ALL SELECT 'stale_pre_1996',
        |    CAST(sum(CAST(o_orderdate < TIMESTAMP '1996-01-01' AS BIGINT))
        |      AS BIGINT), count(*) FROM orders
        |) ORDER BY rule""".stripMargin,
    "v3_integrity" ->
      """SELECT 'events->customer' AS rel,
        |  (SELECT count(*) FROM events) AS n_child,
        |  (SELECT count(*) FROM events e ANTI JOIN customer c
        |     ON e.user_id = c.c_custkey) AS n_orphan,
        |  (SELECT count(*) FROM customer c ANTI JOIN events e
        |     ON c.c_custkey = e.user_id) AS n_childless
        |UNION ALL
        |SELECT 'lineitem->orders',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l ANTI JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey),
        |  (SELECT count(*) FROM orders o ANTI JOIN lineitem l
        |     ON o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o ANTI JOIN customer c
        |     ON o.o_custkey = c.c_custkey),
        |  (SELECT count(*) FROM customer c ANTI JOIN orders o
        |     ON c.c_custkey = o.o_custkey)
        |ORDER BY rel""".stripMargin)
}
