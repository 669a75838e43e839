package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic, content-keyed sampling for training-data curation.
  *
  * `df.sample(rate)` / TABLESAMPLE draw from a per-partition RNG: the
  * selected set changes with partition layout, task retries, and
  * cluster topology — a re-run of a 100 TB curation job yields a
  * DIFFERENT corpus, which poisons ablations and cache reuse. The
  * keyed coin `h32(key ++ salt) % 1e6 < rate·1e6` gives every row a
  * stable fate: reproducible across runs, engines (md5-portable, so
  * the DuckDB oracle can replay it), and any repartitioning; a changed
  * `salt` draws a fresh independent sample. Evaluates inside the
  * scan's projection — no shuffle, no state, scan-bound like every
  * quality filter.
  *
  * Choose the key for the stability you need: a stable id (t9's
  * doc_id) is reproducible within one corpus snapshot; key on a
  * content hash (`md5(text)`) instead and the selection also survives
  * re-ingestion that reassigns ids. Rows with a NULL key are dropped
  * (null hash → null comparison), identically in both engines.
  *
  * Rates are quantized to millionths (integer threshold): a double
  * `rate * h` comparison can disagree across engines at boundary
  * values; `pmod(h, 1e6) < floor(rate·1e6)` cannot.
  */
object Sampling {

  private val M = 1000000L

  private[graft] def coin(key: Column, salt: String): Column =
    pmod(Hashing.h32(concat(key.cast("string"), lit(salt))), lit(M))

  /** Keep each row iff its keyed coin lands below `rate`. */
  def deterministic(df: DataFrame, key: Column, rate: Double,
      salt: String = ""): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(coin(key, salt) < lit((rate * M).toLong))
  }

  /** Sample DOWN TO a size budget (tokens, bytes, rows — any additive
    * weight): the curation ask is usually "give me ~50 B tokens of
    * this", not "give me 3% of it". Exact greedy cut-off (take docs in
    * some order until the budget fills) is a global running sum —
    * inherently sequential, a one-task bottleneck at 100 TB. The
    * scalable form converts the budget to a RATE: total = Σ weight (one
    * partial-agg pass), keep rows whose coin lands below
    * `budget·1e6 div total` — all integer arithmetic, so the threshold
    * is engine-exact and the expected kept weight is the budget. The
    * kept weight concentrates hard around it: independent coins give
    * relative deviation O(1/√n_docs) (<1% beyond ~10k docs). Same
    * deterministic-coin contract as [[deterministic]]; the total joins
    * in as a broadcast single-row frame, never a collect.
    */
  def toWeightBudget(df: DataFrame, key: Column, weight: Column,
      budget: Long, salt: String = ""): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val tot = df.agg(sum(weight.cast("long")).as("__total"))
    // budget·1e6 in DECIMAL: a byte-scale budget (≥ ~9.2e12) overflows
    // the Long multiply — ANSI mode aborts, non-ANSI wraps negative and
    // silently keeps nothing. An empty/zero-weight corpus divides by
    // zero under ANSI; there is nothing to keep, so the threshold is 0.
    val threshold = when(coalesce(col("__total"), lit(0L)) === 0L, lit(0L))
      .otherwise(expr(
        s"cast((cast($budget as decimal(38,0)) * $M) div __total as bigint)"))
    df.join(broadcast(tot))
      .filter(coin(key, salt) < threshold)
      .drop("__total")
  }

  /** Per-stratum rates (e.g. downsample dominant languages, keep rare
    * ones whole) — the mixture-rebalancing step of corpus curation.
    * Strata absent from `rates` fall back to `defaultRate`. The rate
    * lookup compiles to a when-chain (codegen'd, broadcast-free);
    * suited to the low-cardinality strata (language, source, license)
    * curation actually keys on.
    */
  /** Temperature-rebalanced mixture sampling — [[stratified]] with the
    * per-group rates COMPUTED from the corpus's own distribution
    * instead of hand-picked: group g is kept at a rate that reshapes
    * group masses n_g toward n_g^τ (τ < 1 flattens the mixture — the
    * standard recipe for keeping head languages/sources from drowning
    * the tail; τ=1 is proportional, τ=0 uniform), scaled to an expected
    * `targetRows` total and capped at 1 (this operator never
    * upsamples).
    *
    * Scale shape: one partial-agg pass for the k group counts, the
    * k-row threshold table broadcast back — the corpus is read twice
    * but never shuffled.
    *
    * Determinism: thresholds are µ-unit integers; weights go through
    * fixed-point (floor(√n·10⁶)) and the group-weight SUM is integer —
    * order-independent. τ = 0.5 (the default, and the common choice)
    * computes via `sqrt`, which IEEE requires correctly rounded —
    * bit-identical in every engine; other τ use `power`, which is NOT
    * so guaranteed and may flip a floor at a ulp boundary cross-engine
    * (fine within one engine — Spark's Math.pow is deterministic).
    */
  def temperatureMix(df: DataFrame, group: Column, key: Column,
      targetRows: Long, tau: Double = 0.5, salt: String = ""): DataFrame = {
    require(tau >= 0 && tau <= 1, s"tau must be in [0,1]: $tau")
    require(targetRows >= 0, s"targetRows must be non-negative: $targetRows")
    val wExpr =
      if (tau == 0.5) "SQRT(CAST(__n AS DOUBLE))"
      else s"POWER(CAST(__n AS DOUBLE), CAST($tau AS DOUBLE))"
    val stats = df.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
      .withColumn("__wfx",
        expr(s"CAST(FLOOR($wExpr * CAST($M AS DOUBLE)) AS BIGINT)"))
    val tot = stats.agg(sum("__wfx").as("__W"))
    val thresh = stats.join(broadcast(tot))
      .withColumn("__thr", least(lit(M), expr(
        s"""CAST(FLOOR(CAST(__wfx AS DOUBLE) * CAST($targetRows AS DOUBLE)
           | * CAST($M AS DOUBLE)
           | / (CAST(__W AS DOUBLE) * CAST(__n AS DOUBLE))) AS BIGINT)"""
          .stripMargin.replace("\n", " "))))
      .select(col("__g"), col("__thr"))
    df.join(broadcast(thresh), group === col("__g"))
      .filter(coin(key, salt) < col("__thr"))
      .drop("__g", "__thr")
  }

  def stratified(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val thresh = rates.foldLeft(lit((defaultRate * M).toLong)) {
      case (acc, (stratum, rate)) =>
        when(strata === lit(stratum), lit((rate * M).toLong)).otherwise(acc)
    }
    df.filter(coin(key, salt) < thresh)
  }

  /** Cap rows PER GROUP at `cap`, selecting deterministically by a
    * content-keyed hash order — domain balancing for a crawl corpus
    * (the heaviest domains would otherwise dominate the training mix;
    * C4/RefinedWeb-style pipelines cap per registered domain). Unlike a
    * rate, a cap guarantees the bound even when group sizes are
    * heavy-tailed; unlike `ORDER BY random()`, the md5 order gives every
    * re-run (and the DuckDB oracle) the identical survivor set.
    *
    * Scale shape: one hash exchange on `group` for the row_number
    * window — each group sorts independently. The failure mode at
    * 100 TB is a pathological MEGA-domain whose full per-group sort is
    * one straggler task; `prefilterFudge = Some(f)` bounds it: keep
    * only rows whose 32-bit hash PREFIX lands under
    * `T = 2³² · f·cap / |group|` before the window. The prefix order is
    * a coarsening of the md5-string rank order, so the kept set is
    * rank-prefix-closed: whenever a group keeps ≥ min(cap, |group|)
    * rows, its true top-cap is inside them — and groups that kept fewer
    * (hash fluctuation; P ≈ e^(−f·cap·δ²) by Chernoff) are repaired
    * EXACTLY by falling back to their full row set. Survivors are
    * therefore IDENTICAL to the plain path (equivalence-tested), at the
    * cost of two extra narrow aggregates — the trade that wins when a
    * domain is millions of rows.
    */
  def capPerKey(df: DataFrame, group: Column, key: Column, cap: Int,
      salt: String = "", prefilterFudge: Option[Int] = None): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val order = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(md5(concat(key.cast("string"), lit(salt))), key)
    val base = prefilterFudge match {
      case None => df
      case Some(fudge) =>
        require(fudge >= 1, s"fudge must be >= 1: $fudge")
        val h = Hashing.h32(concat(key.cast("string"), lit(salt)))
        val sizes = df.groupBy(group.as("__g"))
          .agg(count(lit(1)).as("__n"))
        val thr = least(lit(4294967296L),
          ceil(lit(4294967296.0) * fudge * cap / col("__n")).cast("long"))
        // <=> (null-safe): the plain path's window treats a NULL group
        // as its own partition, so the prefilter joins must match NULL
        // groups too or the survivor-equivalence contract breaks for
        // nullable group columns
        val tagged = df.join(sizes, group <=> col("__g")).drop("__g")
          .withColumn("__pass", h <= thr)
        val passCnt = tagged.filter(col("__pass"))
          .groupBy(group.as("__g2")).agg(count(lit(1)).as("__p"))
        tagged.join(passCnt, group <=> col("__g2"), "left").drop("__g2")
          .withColumn("__p", coalesce(col("__p"), lit(0L)))
          // keep the pass set; a group whose pass set can't contain its
          // full top-cap falls back to ALL its rows (exact repair)
          .filter(col("__pass") ||
            col("__p") < least(lit(cap.toLong), col("__n")))
          .drop("__pass", "__p", "__n")
    }
    base.withColumn("__rn", row_number().over(order))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
