package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: regenerate PLANS.md — the formatted physical plans of the
  * flagship queries, so the scale claims in scaladoc (pushdown, reuse,
  * join shapes) are reviewable without running anything.
  *
  *   sbt "runMain graft.tools.DumpPlans"
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val flagship = Seq(
      "a1_groupby_sum_top5" -> "partial+final HashAggregate, top-5 as TakeOrderedAndProject (no global sort)",
      "j1_join_broadcast" -> "dim join left to threshold/AQE: broadcasts below threshold (PlanAuditSpec pins the sf0.1 final plan), degrades to shuffle join at scale",
      "j4_star_join" -> "fact-fact shuffle join + bounded-dim broadcast; customer join left to AQE",
      "d2_minhash_lsh" -> "per-row native graft_minhash signature (scan -> project, zero pre-band exchanges), symmetric shuffle self-join, ReusedExchange",
      "d3_simhash" -> "per-row native graft_simhash signature — the former (doc_id, tok) token-stream exchange is gone; first shuffle is the 15-bit band join",
      "s2_ann_lsh" -> "fused score-in-join (r9): bucket self-join consumes the pre-partitioned persisted float index with ZERO exchanges on either side (InMemoryTableScan preserves the cache's (tbl, bk) partitioning), exact cosine scored in the join projection, DistinctTopKAggregator collapses candidates to <=3/query map-side — pair-grain exchanges: none",
      "pipe_docs_prep" -> "quality filter pruned into the scan, dedup stages chained in one plan",
      "w5_topk_aggregator" -> "partial-aggregable typed top-k (ObjectHashAggregate), no per-group sort",
      "w6_range_rolling" -> "repartition(l_suppkey) satisfies BOTH the daily agg's and the window's clustering — one hash exchange, no second shuffle (W6Compare: 1.30 s vs 1.73 s at sf0.1). Form is a parameter: mapSideCombine=true plans the two-exchange groupBy whose first shuffle carries combiner-reduced partials — flip when rows per (supplier, day) >~ 4 (sf0.1 density is ~1.5); both forms row-identical (PlanAuditSpec)",
      "j5_asof_join" -> "AS-OF join as union+window: one key shuffle, |L|+|R| rows, NO Join node (vs the naive inequality join's O(L x R_per_key) fan-out)",
      "j6_range_join" -> "band join as (key, time-bucket) equi-join + exact residual: hash join, never nested-loop, hot keys split across buckets",
      "t8_frequent_tokens" -> "Misra-Gries sketch (ObjectHashAggregate, <=k per task) -> broadcast candidates -> exact recount: shuffle is k rows/task, not per-distinct-token",
      "o7_latest_per_key" -> "CDC current-row read as partial-aggregable max_by((ts,id) struct): partial SortAggregate per map task (struct buffers aren't hash-aggregable) -> exchange carries <=1 candidate/key/task -> final agg; NO Window/full-log shuffle",
      "d7_span_dedup" -> "within-doc boilerplate removal: chunk explode -> md5 frequency agg -> broadcast LEFT ANTI vs the tiny over-frequent set -> one per-doc rebuild agg",
      "t11_tfidf_top" -> "tf explode+agg, df reused FROM the tf relation (no second corpus scan), corpus size N broadcast as single-row frame, top-3 via one doc_id window",
      "s5_kmeans_assign" -> "broadcast centroid frame, partial-aggregable min_by argmax (corpus never shuffles to assign), fixed-point explode->agg Lloyd update",
      "s8_hybrid_rrf" -> "two broadcast bounded-query rankers collapsed to <=20 id+rank rows/query BEFORE the fusion full-outer join",
      "w9_funnel" -> "three stacked running-max windows over ONE (user, ts) exchange — no per-step self-joins; day filter pushed to the RAW ts long (PushedFilters on the events scan)",
      "s3_embedding_neardup" -> "fused score-in-join (r9): exact cosine + threshold filter inside the bucket self-join over the shared pre-partitioned float index; the only pair-grain exchange is the OUTPUT-sized survivor dropDuplicates (PlanAuditSpec pins the zero-exchange self-join)",
      "t29_winnowing" -> "winnowing fingerprints: gram explode + packed-integer window min + per-doc distinct all inside ONE doc_id exchange (WinnowingSpec pins it at 1); fingerprint relation materialized once, pair stage is a fingerprint equi-join — the d2 band-join shape",
      "d6_transitive_dedup" -> "LSH candidates -> exact-Jaccard verify -> alternating large/small-star CC over the PAIR SET only (per-round localCheckpoint truncates lineage; the dump shows the post-fixpoint label anti-join — the iteration's plans are intentionally absent, each round is the same two window/distinct steps)",
      "l1_scd2" -> "SCD2 interval build: change-detect lag + validity lead planned under ONE user_id exchange (two Window nodes, one Sort, one Exchange before the output sort — WarehouseSpec bounds shuffles at 2)",
      "a14_equidepth" -> "equi-depth histogram: exact-percentile boundary agg collapses to ONE row, broadcast back (BroadcastNestedLoopJoin on a 1-row side = a constant), bucket as nine codegen'd when-terms + partial agg — NOT a global ntile window (which would sort all rows in one task)",
      "d9_substring_dedup" -> "global exact-substring dedup: chunk explode -> min_by survivor election on md5(chunk) (partial-aggregable) -> same-key join back (no broadcast of the corpus-sized survivor relation; PlanAuditSpec pins it with thresholds off) -> one per-doc rebuild agg",
      "s9_pq_topk" -> "product-quantization ANN: zero-shuffle literal-codebook encode, broadcast ADC LUT scan (corpus never shuffles to score), candidate agg + exact re-rank joins bounded (PlanAuditSpec caps exchanges at 6)",
      "s13_ivfpq_topk" -> "IVF-PQ combined index: broadcast centroid assignment (corpus never shuffles to assign), residual encode as codegen'd graft_dot via linearity (no interpreted lambdas), broadcast probe rows carrying per-query LUT + dot(q,cent), ADC only inside the nprobe=2 lists, typed top-40 partial agg, exact re-rank tail",
      "t18_leakage_split" -> "leakage-safe split: inherits d5's CC over the LSH pair set (iteration plans intentionally absent — each round is the same two window/distinct steps); the dump shows the post-fixpoint component-coin join, one component-key shuffle, never a doc-pair cartesian",
      "d10_allpairs_jaccard" -> "exact AllPairs/PPJoin set-similarity: shingles hashed to longs, materialized ONCE across the four consuming branches (the nearDupPairs materializer dial), df-ascending prefix relation, prefix self-join with length + positional prunes (candidates 300k -> 69k at sf0.1), exact intersect on candidate ids only; 13.7 -> 1.6 s at sf0.1, bexp 0.99 at 10x (PlanAuditSpec bounds exchanges at 10)",
      "d12_containment" -> "directed set-containment join (|A.B|/|A| >= 0.8): asymmetric prefix filter — contained-side ~0.2|A| prefix probes the FULL container list (no tau|B| prune exists; length filter 5nb>=4na), positional bound at the first common shingle; exact intersect on candidate ids; completeness vs brute proven incl. the exact 0.8 boundary",
      "w13_ewma" -> "dyadic fixed-point EWMA: repartition(user) satisfies BOTH the (user, day) grain agg (hash on a key subset clusters the finer grain) and the 7-lag window — one log-sized exchange + output sort (EventAnalyticsSpec asserts exactly 2); weights 128..1 are exact integers, no float summation anywhere",
      "g1_pagerank" -> "integer-ppm PageRank: edges aggregate out of lineitem⋈orders ONCE into a localCheckpoint (the dump shows NO parquet scan — iterations never rescan facts, GraphSpec asserts it); each of 5 unrolled iterations is one rank⋈edges join + dst partial agg; at cluster scale edges would be bucketed on src (lake/Bucketing) to make the per-round join exchange-free",
      "s15_filtered_topk" -> "metadata-filtered ANN: the label predicate rides the index probe's JOIN KEY PATH (labeled bucket rows; query buckets broadcast) — mismatched candidates are never fetched, scored, or shuffled; rank<=5 plans as WindowGroupLimit (no full sort); pre-filter semantics, not a post-filter on unfiltered top-k",
      "sj1_interval_join" -> "stream-stream interval join's batch twin: ONE user_id equi-join with the time bound as a join residual — never a time-cross; AQE broadcasts the click side at test SF, degrades to a key-partitioned shuffle join at scale (bytes measured linear, STREAM_SCALE_R11 bexp 0.998)")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the flagship queries\n\n")
    sb.append(s"Generated by `graft.tools.DumpPlans` on `$sf` (AQE initial plans;\n")
    sb.append("stage reuse materializes at runtime — see PlanAuditSpec).\n")
    flagship.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      sb.append(s"\n## $name\n\n_${note}_\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${flagship.size} plans)")
    spark.stop()
  }
}
