package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.Tables._

/** Cross-document duplicated-span detection and removal — the
  * word-grain form of exact substring deduplication (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", which
  * removes every repeated ≥50-token span from the corpus keeping one
  * copy). The reference pipeline has no counterpart; this is extension
  * surface for the LLM-curation layer, sitting between the
  * within-document repetition signal (t13) and the whole/near-document
  * dedup family (d1–d12): t13 never sees a span repeated *across*
  * documents, and MinHash misses a boilerplate paragraph pasted into
  * thousands of otherwise-distinct pages — the single most common
  * duplication mode in crawl corpora.
  *
  * Relation to d9 (`Dedup.dropDuplicateSpansGlobal`): d9 tiles each
  * document into NON-OVERLAPPING span-width chunks and dedups
  * identical chunks — O(tokens/span) occurrence rows, but blind to any
  * duplicate that is not chunk-aligned (a boilerplate paragraph
  * starting mid-chunk slips through every tile boundary). t40/t41
  * slide the window over EVERY start position: alignment-oblivious
  * like the suffix-array original, at O(tokens) occurrence rows —
  * span-width× more than d9, same asymptotic class, one scan either
  * way. d9 stays as the cheap tiled screen; t40/t41 are the exact
  * detector and cut.
  *
  * Shape, both operators: every word-[[N]]-gram occurrence
  * `(doc_id, start, ngh)` is materialized once (token-scale, one
  * scan), aggregated on the ngram hash to find spans occurring ≥ 2
  * times corpus-wide, and joined back to flag the duplicated starts.
  * Both the aggregate and the probe shuffle the same occurrence
  * relation on the same key, so inline the exchange is planned once
  * and reused, and SERVED (the persisted `ngo` table bucketed on
  * `ngh` — the 100 TB default) neither consumer shuffles the
  * occurrence side at all. The
  * reference algorithm's suffix array is a single-machine structure;
  * the group-then-probe form is the Spark-native equivalent at fixed
  * span width: scan-bound, shuffle keyed on content, never all-pairs,
  * and the dup/canonical contractions are HAVING-filtered (unique
  * spans — the overwhelming majority at crawl scale, Zipf — never
  * leave the aggregate).
  *
  * Within-document work (interval merge, token masking) runs in
  * per-doc windows ordered by position — bounded by document length,
  * independent of corpus size.
  *
  * Measured scale law (r16, on the alias-free tier generator —
  * planted dup density held at the source tier's ~10% at every
  * factor, ScaleUpSpec): every shuffled relation is bounded by the
  * occurrence count — linear in corpus. 10× step: bexp 0.999/0.998
  * (SCALE_NEW_R16_10x). 10→100 step: the raw reading is
  * bexp 1.374/1.278 (SCALE_NEW_R16_10to100), which is a
  * broadcast→shuffle THRESHOLD TRANSITION, not a law — at the sf1
  * tier the duplicated-hash side still broadcasts into the probe, at
  * sf10 it outgrows the threshold and the probe pays a shuffle join;
  * with broadcasts disabled on BOTH planner paths the same step
  * reads bexp 0.999/0.998 (SCALE_R16_BCASTOFF_10to100 — the
  * SCALE_R12_BCASTOFF methodology), i.e. linear on both sides of the
  * one-time transition. r15's saturated-tier history
  * (SCALE_R15_SAT_100to200, measured through the old generator's
  * mod-26 dup-density ceiling) remains as the worst-case record.
  */
object SubstringDedup {

  /** Span width in words. Lee et al. use 50 BPE tokens; the synthetic
    * corpus' documents average ~50 words, so 5 keeps the operator
    * meaningfully exercised at test scale. The algorithm is
    * width-oblivious.
    */
  val N = 5

  /** Bits reserved for the in-document start position in the packed
    * canonical-occurrence key `doc_id * 2^PosBits + start`: the
    * lexicographic (doc_id, start) min as ONE long, computable by both
    * engines with a plain `min`. Bounds: start < 2^20 (a 1M-word
    * document ≈ 5 MB of text) and doc_id < 2^43. A corpus that breaks
    * either bound should switch the canonical argmin to a
    * `min(struct(doc_id, start))` (Spark) / arg_min pair (engines
    * without struct ordering) — same semantics, two columns instead of
    * one packed key.
    */
  val PosBits = 20
  private val PosCap = 1L << PosBits

  /** All word-N-gram occurrences of `docs` at the INDEX grain:
    * (doc_id, s, ngh) with s the 0-based start and ngh the 16-byte
    * md5 of the ngram text — grouping and joining on the digest
    * instead of the variable-width string keeps the shuffled relation
    * fixed-width (16 B + ids per token) and is semantically identical
    * absent an md5 collision (2⁻⁶⁴ birthday scale at any corpus size
    * that fits hardware). Built from the per-row token array (no
    * token explode — the transform runs inside the scan projection);
    * docs shorter than N contribute nothing.
    *
    * Per-doc ROW LOCALITY: a doc's occurrence rows derive from its
    * text alone, so the persisted form (below) appends increments
    * row-for-row ≡ rebuild — same argument as the winnowing
    * fingerprint and mm phash tables.
    */
  private[graft] def occurrencesOf(docs: DataFrame): DataFrame = {
    // the digest loop is the native graft_ngram_md5 kernel
    // (TextKernels.ngramMd5): the SQL transform/slice/concat_ws/md5
    // chain is an array-HOF CodegenFallback, measured 8.85× slower on
    // the 100×-tier digest stage (6.57 s vs 0.74 s, same-JVM A/B —
    // NGO_KERNEL_R15.json, tools/NgoKernelBench); bit-equality of the
    // two forms is spec-pinned over the whole corpus. Short docs yield
    // an empty array — posexplode emits no rows, which IS the ≥ N
    // filter.
    graft.functions.TextSignatures.ensureRegistered(docs.sparkSession)
    docs
      .select(
        col("doc_id"),
        posexplode(expr(s"graft_ngram_md5(text, $N)")))
      .withColumnRenamed("pos", "s")
      .withColumnRenamed("col", "ngh")
  }

  /** The occurrence relation t40/t41 consume: the persisted bucketed
    * table when one serves (fresh stamp), else computed inline. Served
    * is the 100 TB default — the ngram aggregate and the probe join
    * both key on `ngh`, the table's bucket column, so the served plans
    * run them without an Exchange on the occurrence side.
    */
  private def occurrences(s: SparkSession, d: String): DataFrame =
    servedOccurrences(s, d)
      .getOrElse(occurrencesOf(documents(s, d)))

  /** (doc_id, n_tokens) — the left frame outputs join coverage onto,
    * so docs with no duplicated span (and docs too short to hold one)
    * report zeros rather than vanishing.
    */
  private def docTokensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))

  private def docTokens(s: SparkSession, d: String): DataFrame =
    docTokensOf(documents(s, d))

  /** Merged covered-token count per doc from a set of span starts.
    * All spans have width N and per-doc starts are processed in
    * order, so interval union reduces to Σ min(gap to previous start,
    * N) — one lag window per doc, no explicit interval-merge pass.
    */
  private def coveredTokens(starts: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("s")
    starts
      .withColumn("g",
        least(col("s") - coalesce(lag("s", 1).over(w), col("s") - N), lit(N)))
      .groupBy("doc_id")
      .agg(sum("g").as("covered"))
  }

  /** t40: per-document duplicated-span coverage — the detection
    * signal. `covered_tokens` counts tokens lying inside any
    * word-N-gram that occurs ≥ 2 times corpus-wide (including twice
    * within one document); `coverage_bp` is the floor'd basis-point
    * fraction. The filtering decision this feeds ("drop or trim docs
    * that are mostly boilerplate") is the detection half of exact
    * substring dedup; t41 is the surgical half.
    */
  def t40DupSpanCoverage(s: SparkSession, d: String): DataFrame = {
    val o = occurrences(s, d)
    val dup = o.groupBy("ngh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("ngh")
    val cov = coveredTokens(o.join(dup, "ngh").select("doc_id", "s"))
    docTokens(s, d)
      .join(cov, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        coalesce(col("covered"), lit(0L)).cast("long").as("covered_tokens"),
        floor(coalesce(col("covered"), lit(0L)).cast("double") * 10000.0 /
          col("n_tokens")).cast("long").as("coverage_bp"))
      .orderBy("doc_id")
  }

  /** The cut — remove every duplicated span occurrence except the
    * canonical one (corpus-wide min (doc_id, start), packed into one
    * long — see [[PosBits]]) and reconstruct the surviving text:
    * (doc_id, n_tokens, cut_tokens, kept_tokens, text_clean), d9's
    * `dropDuplicateSpansGlobal` counterpart at sliding grain, the
    * corpus transform pipelines compose over. Keeping exactly one copy
    * is the Lee et al. contract: global token-grain dedup without
    * dropping whole documents. `occ` is the occurrence relation to
    * cut against (the served table or an inline build).
    *
    * A token is removed iff some NON-canonical duplicated span covers
    * it; tokens of the canonical occurrence survive (unless a
    * different overlapping non-canonical span claims them). The mask
    * is computed without a per-token × per-span join: cut starts are
    * unioned into the token stream as marker rows and a per-doc
    * range-frame window (RANGE N-1 PRECEDING .. CURRENT) carries each
    * marker over exactly the N positions it covers.
    */
  def cutSpans(docs: DataFrame, occ: DataFrame): DataFrame =
    cutSpans(docs, occ, N)

  /** The per-gram cut's SURVIVING token positions (doc_id, p, tok) —
    * the mask core of [[cutSpans]], exposed so the t44 residue
    * diagnostic can diff positional cut sets against
    * [[keptTokensMaximal]] at equal grain (r16 verdict #7).
    */
  private[graft] def keptTokensPerGram(docs: DataFrame, occ: DataFrame,
      w: Int): DataFrame = {
    val o = occ
    // ADVICE r15: the PosBits packing bound is CHECKED, not just
    // documented — an occurrence outside it (a >1M-word doc, or a
    // doc_id past 2^43) raises loudly instead of silently corrupting
    // canonical election. One comparison per occurrence row, inside
    // codegen, next to an md5 — negligible.
    val key = when(col("s") < lit(PosCap) && col("doc_id") < lit(1L << 43),
      col("doc_id") * lit(PosCap) + col("s"))
      .otherwise(expr(
        "CAST(raise_error('graft substring-dedup: occurrence outside the " +
          "packed-key bounds (start >= 2^20 or doc_id >= 2^43) — switch " +
          "the canonical argmin to min(struct(doc_id, s))') AS BIGINT)"))
    val canon = o.groupBy("ngh")
      .agg(min(key).as("ck"), count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select("ngh", "ck")
    val cuts = o.join(canon, "ngh")
      .filter(key =!= col("ck"))
      .select(col("doc_id"), col("s"))

    val tokens = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "p")
      .withColumnRenamed("col", "tok")
    val ev = tokens.select(col("doc_id"), col("p"), col("tok"),
        lit(false).as("iscut"))
      .unionByName(cuts.select(col("doc_id"), col("s").as("p"),
        lit(null).cast("string").as("tok"), lit(true).as("iscut")))
    // RANGE frame: marker at position s reaches tokens p ∈ [s, s+w-1].
    // Marker and token tie on p — RANGE frames include peers, so the
    // marker covers its own start in both engines.
    val wr = Window.partitionBy("doc_id").orderBy("p")
      .rangeBetween(-(w - 1), Window.currentRow)
    ev.withColumn("lastcut", max(when(col("iscut"), col("p"))).over(wr))
      .filter(!col("iscut") && col("lastcut").isNull)
      .select("doc_id", "p", "tok")
  }

  /** Width-parameterized [[cutSpans]] — `w` must be the width `occ`'s
    * n-grams were digested at (the default N path is t41; the t44
    * residue diagnostic drives it at [[WBpe]] over the trained token
    * stream to price per-gram vs maximal-run election at equal grain).
    */
  def cutSpans(docs: DataFrame, occ: DataFrame, w: Int): DataFrame = {
    val kept = keptTokensPerGram(docs, occ, w)
    val agg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("kept"),
      array_join(expr(
        "transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"),
        " ").as("text_clean"))

    docTokensOf(docs)
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        (col("n_tokens") - coalesce(col("kept"), lit(0L))).cast("long")
          .as("cut_tokens"),
        coalesce(col("kept"), lit(0L)).cast("long").as("kept_tokens"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** The corpus after the cut, as a reusable relation — what a
    * curation pipeline composes downstream stages over
    * (pipe_span_curate chains quality → DSIR → dedup → pack on it).
    * Serves the persisted occurrence table when fresh, like t40/t41.
    */
  def cleanedCorpus(s: SparkSession, d: String): DataFrame =
    cutSpans(documents(s, d).select("doc_id", "text"), occurrences(s, d))

  /** t41: [[cutSpans]] with the cleaned text md5'd — the hash, not the
    * text, keeps the oracle's compare payload bounded; pipelines use
    * [[cutSpans]] directly for the string.
    */
  def t41SubstringDedup(s: SparkSession, d: String): DataFrame =
    cutSpans(documents(s, d).select("doc_id", "text"), occurrences(s, d))
      .select(
        col("doc_id"), col("n_tokens"), col("cut_tokens"),
        col("kept_tokens"), md5(col("text_clean")).as("clean_md5"))
      .orderBy("doc_id")

  // ---- persisted occurrence index (r15) ----------------------------
  // The t40/t41 occurrence relation is the family's per-corpus derived
  // relation — token-scale but fixed-width (doc_id, s, 16-byte ngh) —
  // and recomputing it per query re-splits and re-hashes every
  // document, the same recompute-per-query bill the band, fingerprint,
  // phash, and adjacency tables already escaped. Lee et al.'s suffix
  // array is likewise a corpus-sized persisted structure; this is its
  // bucketed-table counterpart. Bucketed on `ngh` — the key BOTH
  // consumers shuffle on (the duplicate-count aggregate and the
  // dup-start probe join) — so the served plans read the occurrence
  // side exchange-free. Stamped against documents.parquet; per-doc row
  // locality (see occurrencesOf) makes appendIncrement sound
  // row-for-row, with IndexTables' prevSig guard, crash posture, and
  // auto-compaction inherited whole.

  private val NgoPrefix = "ngo"
  private def ngoPath(d: String): String = s"$d/documents.parquet"

  /** Persist the occurrence index table for tier `d`. */
  def persistOccurrenceIndex(s: SparkSession, d: String,
      buckets: Int = 32): String =
    graft.lake.IndexTables.persist(s,
      occurrencesOf(documents(s, d)),
      NgoPrefix, ngoPath(d), Seq("ngh"), buckets)

  /** Drop the occurrence table for tier `d`, if any. */
  def dropOccurrenceIndex(s: SparkSession, d: String): Unit =
    graft.lake.IndexTables.drop(s, NgoPrefix, ngoPath(d))

  /** The table's stamp — [[appendOccurrenceIndex]]'s prevSig handle. */
  def occurrenceStamp(s: SparkSession, d: String): Option[String] =
    graft.lake.IndexTables.stampOf(s, NgoPrefix, ngoPath(d))

  /** INCREMENTAL maintenance: after `admitted` docs land in the
    * corpus, append exactly their occurrence rows and re-stamp —
    * append ≡ rebuild row-for-row by per-doc locality
    * (SubstringDedupSpec pins it, plus the prevSig guard posture
    * inherited from IndexTables).
    */
  def appendOccurrenceIndex(s: SparkSession, d: String,
      admitted: DataFrame, prevSig: String): String =
    graft.lake.IndexTables.appendIncrement(s,
      occurrencesOf(admitted), NgoPrefix, ngoPath(d), prevSig)

  private[graft] def servedOccurrences(s: SparkSession,
      d: String): Option[DataFrame] =
    graft.lake.IndexTables.serve(s, NgoPrefix, ngoPath(d))

  /** Admission default for the streaming screen: flag docs whose
    * duplicated-span coverage exceeds half their tokens.
    */
  val MaxStreamCoverageBp = 5000L

  /** The INCREMENT screen — t40's coverage for `batch` docs against
    * corpus ∪ batch, without touching corpus-side coverage: a batch
    * doc's span is duplicated iff its ngram already occurs in the
    * corpus (≥1 there + 1 here = 2) or occurs ≥ 2 times within the
    * batch itself — exactly "count ≥ 2 on corpus ∪ batch" restricted
    * to batch spans (SubstringDedupSpec pins the equivalence against
    * t40 run on the union). Returns
    * (doc_id, n_tokens, covered_tokens, coverage_bp, admit).
    *
    * Scale shape (the d13 admission posture): the batch's distinct
    * ngram hashes — bounded by batch tokens, micro-batch-sized —
    * join INTO `corpusOcc` (the persisted bucketed table when
    * serving), so the corpus is scanned once per batch, broadcast-hash
    * probed by the small side, and NEVER self-joined or re-shuffled;
    * the within-batch duplicate count aggregates batch-sized data
    * only. Used verbatim by the batch path and
    * [[graft.streaming.Streams.spanScreenStream]] so the two cannot
    * drift.
    */
  def screenIncrement(corpusOcc: DataFrame, batch: DataFrame,
      maxCoverageBp: Long = MaxStreamCoverageBp): DataFrame = {
    val bOcc = occurrencesOf(batch)
    val withinDup = bOcc.groupBy("ngh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("ngh")
    val corpusHit = corpusOcc.select("ngh")
      .join(bOcc.select("ngh").distinct(), "ngh")
      .distinct()
    val dupStarts = bOcc
      .join(withinDup.unionByName(corpusHit).distinct(), "ngh")
      .select("doc_id", "s")
    docTokensOf(batch)
      .join(coveredTokens(dupStarts), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        coalesce(col("covered"), lit(0L)).cast("long").as("covered_tokens"),
        floor(coalesce(col("covered"), lit(0L)).cast("double") * 10000.0 /
          col("n_tokens")).cast("long").as("coverage_bp"))
      .withColumn("admit", col("coverage_bp") <= lit(maxCoverageBp))
  }

  // ---- production-width cut over trained tokenizer ids (r16, t44) --

  /** Span width in TRAINED BPE tokens — Lee et al. 2022's production
    * grain and width (§3: remove every repeated span of ≥ 50 BPE
    * tokens, keeping one occurrence). t40/t41's N=5 word grain remains
    * the test-scale surface; t44 is the same family at the width and
    * unit a production curation run uses, over [[TextAnalysis]]'s
    * trained token stream.
    */
  val WBpe = 50

  /** N-gram occurrences over an arbitrary token stream: `toks` is
    * (doc_id, text) with text a space-joined token sequence (word
    * grain or trained-BPE grain — the digest kernel is
    * unit-oblivious).
    */
  private[graft] def occurrencesOfText(toks: DataFrame, n: Int): DataFrame = {
    graft.functions.TextSignatures.ensureRegistered(toks.sparkSession)
    toks
      .select(col("doc_id"), posexplode(expr(s"graft_ngram_md5(text, $n)")))
      .withColumnRenamed("pos", "s")
      .withColumnRenamed("col", "ngh")
  }

  /** The MAXIMAL-RUN cut (Lee et al. §3 semantics at fixed window
    * width): duplicated n-gram starts are merged into maximal runs of
    * consecutive positions BEFORE canonical election, the run's full
    * covered token span is its identity, and election keeps the
    * corpus-wide min (doc_id, start) occurrence of each repeated
    * maximal span — so a long boilerplate region is kept or cut
    * ATOMICALLY per occurrence. This is what [[cutSpans]]' per-gram
    * election cannot promise: a third document sharing only an
    * interior slice of the region can win individual grams and
    * mosaic-cut the canonical occurrence itself; at run grain the
    * region's occurrences elect among EACH OTHER.
    *
    * Documented conservative residue: a run whose maximal content is
    * corpus-UNIQUE (it only partially overlaps other regions — the
    * containment case) is kept whole. The paper's suffix-array pass
    * would trim the shared slice from one side; electing at run grain
    * trades that for never cutting text that exists nowhere else as a
    * complete span. Its gram-level duplication still shows in the t40
    * coverage signal.
    *
    * Scale shape = [[cutSpans]]': one scan → token-scale fixed-width
    * occurrences, HAVING-filtered dup starts, a per-doc lag window for
    * the run merge (bounded by dup starts), the run-hash join back to
    * the doc-grain text (bounded by runs ≪ tokens), and the
    * reconstruction as a marker union + per-doc running-max window —
    * variable-width spans need a ROWS running max over the cut-end
    * instead of t41's fixed-width RANGE frame; same one-sort cost
    * class, never a token × span join.
    */
  def cutSpansMaximal(toks: DataFrame, w: Int): DataFrame = {
    val kept = keptTokensMaximal(toks, w)
    val agg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("kept"),
      array_join(expr(
        "transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"),
        " ").as("text_clean"))

    toks.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        (col("n_tokens") - coalesce(col("kept"), lit(0L))).cast("long")
          .as("cut_tokens"),
        coalesce(col("kept"), lit(0L)).cast("long").as("kept_tokens"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** The maximal-run cut's SURVIVING token positions (doc_id, p, tok) —
    * the mask core of [[cutSpansMaximal]], exposed for the t44 residue
    * diagnostic (r16 verdict #7).
    */
  private[graft] def keptTokensMaximal(toks: DataFrame, w: Int): DataFrame = {
    val o = occurrencesOfText(toks, w)
    val dupStarts = o.join(
      o.groupBy("ngh").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select("ngh"),
      "ngh").select("doc_id", "s")

    // gaps-and-islands: consecutive duplicated starts form one run
    val wOrd = Window.partitionBy("doc_id").orderBy("s")
    val runs = dupStarts
      .withColumn("nr",
        when(col("s") - coalesce(lag("s", 1).over(wOrd), lit(-2L)) === 1, 0L)
          .otherwise(1L))
      .withColumn("rid", sum("nr").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "rid")
      .agg(min("s").as("s0"), (max("s") + lit(w)).as("e"))

    // the run's identity is its FULL covered token span
    val packed = when(
      col("s0") < lit(PosCap) && col("doc_id") < lit(1L << 43),
      col("doc_id") * lit(PosCap) + col("s0"))
      .otherwise(expr(
        "CAST(raise_error('graft substring-dedup: run outside the " +
          "packed-key bounds — switch to min(struct(doc_id, s0))') " +
          "AS BIGINT)"))
    val runH = runs.join(toks, "doc_id")
      .select(col("doc_id"), col("s0"), col("e"),
        md5(concat_ws(" ",
          slice(split(col("text"), " "), col("s0") + 1,
            col("e") - col("s0")))).as("rh"))
    val elected = runH.groupBy("rh")
      .agg(min(packed).as("ck"), count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
    val cuts = runH.join(elected, "rh")
      .filter(packed =!= col("ck"))
      .select(col("doc_id"), col("s0"), col("e"))

    // reconstruction: markers carry their EXCLUSIVE end; a token at p
    // is cut iff the running max of marker ends at-or-before p
    // exceeds p (markers sort before tokens at the same position)
    val tokens = toks
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "p")
      .withColumnRenamed("col", "tok")
    val ev = tokens.select(col("doc_id"), col("p"), col("tok"),
        lit(null).cast("long").as("e"), lit(false).as("iscut"))
      .unionByName(cuts.select(col("doc_id"), col("s0").as("p"),
        lit(null).cast("string").as("tok"), col("e"), lit(true).as("iscut")))
    val wr = Window.partitionBy("doc_id")
      .orderBy(col("p"), col("iscut").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("cut_until", max("e").over(wr))
      .filter(!col("iscut") &&
        (col("cut_until").isNull || col("cut_until") <= col("p")))
      .select("doc_id", "p", "tok")
  }

  /** t44: the production-grain cut — [[cutSpansMaximal]] at
    * [[WBpe]]=50 trained BPE tokens over the corpus's trained token
    * stream (the persisted `bpets` table when fresh — the corpus
    * encode was this query's recompute-per-query bill; served, the
    * per-doc windows and joins also ride its doc_id bucketing),
    * cleaned text md5'd for the compare (the t41 posture).
    */
  def t44BpeSpanCut(s: SparkSession, d: String): DataFrame =
    cutSpansMaximal(TextAnalysis.bpeStream(s, d), WBpe)
      .select(col("doc_id"), col("n_tokens"), col("cut_tokens"),
        col("kept_tokens"), md5(col("text_clean")).as("clean_md5"))
      .orderBy("doc_id")

  /** Composition proof: the cut feeding a downstream per-language
    * aggregate — the [[cutSpans]] transform is a relation like any
    * other (what a curation pipeline does with it), and the whole
    * chain stays one declarative plan.
    */
  def pipeSpanCleanStats(s: SparkSession, d: String): DataFrame =
    cutSpans(documents(s, d).select("doc_id", "text"), occurrences(s, d))
      .join(documents(s, d).select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("kept_tokens").as("kept_tokens"),
        sum("cut_tokens").as("cut_tokens"))
      .orderBy("lang")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t40_dup_span_coverage" -> (t40DupSpanCoverage _),
    "t41_substring_dedup" -> (t41SubstringDedup _),
    "t44_bpe_span_cut" -> (t44BpeSpanCut _),
    "pipe_span_clean_stats" -> (pipeSpanCleanStats _)
  )

  def oracles: Map[String, String] = Map(
    "t40_dup_span_coverage" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(range(len(t)-${N - 1})) AS s,
         |    unnest(list_transform(range(len(t)-${N - 1}),
         |      i -> t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5])) AS ng
         |  FROM docs WHERE len(t) >= $N),
         |dup AS (SELECT ng FROM occ GROUP BY ng HAVING count(*) >= 2),
         |ds AS (SELECT o.doc_id, o.s FROM occ o JOIN dup USING (ng)),
         |gaps AS (SELECT doc_id,
         |  least(s - coalesce(lag(s) OVER (PARTITION BY doc_id ORDER BY s), s - $N), $N) AS g
         |  FROM ds),
         |cov AS (SELECT doc_id, sum(g) AS covered FROM gaps GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(d.t) AS INTEGER) AS n_tokens,
         |  CAST(coalesce(c.covered,0) AS BIGINT) AS covered_tokens,
         |  CAST(floor(coalesce(c.covered,0)*10000.0/len(d.t)) AS BIGINT) AS coverage_bp
         |FROM docs d LEFT JOIN cov c USING (doc_id) ORDER BY doc_id""".stripMargin,
    "t41_substring_dedup" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(range(len(t)-${N - 1})) AS s,
         |    unnest(list_transform(range(len(t)-${N - 1}),
         |      i -> t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5])) AS ng
         |  FROM docs WHERE len(t) >= $N),
         |canon AS (SELECT ng, min(doc_id * $PosCap + s) AS ck
         |          FROM occ GROUP BY ng HAVING count(*) >= 2),
         |cuts AS (SELECT o.doc_id, o.s FROM occ o JOIN canon c USING (ng)
         |         WHERE o.doc_id * $PosCap + o.s <> c.ck),
         |tok AS (SELECT doc_id, unnest(range(len(t))) AS p, unnest(t) AS tok FROM docs),
         |ev AS (
         |  SELECT doc_id, p, tok, FALSE AS iscut FROM tok
         |  UNION ALL
         |  SELECT doc_id, s AS p, NULL AS tok, TRUE AS iscut FROM cuts),
         |marked AS (
         |  SELECT doc_id, p, tok, iscut,
         |    max(CASE WHEN iscut THEN p END) OVER
         |      (PARTITION BY doc_id ORDER BY p
         |       RANGE BETWEEN ${N - 1} PRECEDING AND CURRENT ROW) AS lastcut
         |  FROM ev),
         |kept AS (SELECT doc_id, p, tok FROM marked WHERE NOT iscut AND lastcut IS NULL),
         |agg AS (SELECT doc_id, count(*) AS kept_tokens,
         |        md5(string_agg(tok, ' ' ORDER BY p)) AS clean_md5
         |        FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(d.t) AS INTEGER) AS n_tokens,
         |  CAST(len(d.t) - coalesce(a.kept_tokens,0) AS BIGINT) AS cut_tokens,
         |  CAST(coalesce(a.kept_tokens,0) AS BIGINT) AS kept_tokens,
         |  coalesce(a.clean_md5, md5('')) AS clean_md5
         |FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "t44_bpe_span_cut" ->
      s"""WITH ${TextAnalysis.bpeTokenTextCtes},
         |d2 AS (SELECT doc_id, string_split(text,' ') AS t FROM bt),
         |occ AS (
         |  SELECT doc_id, unnest(range(len(t)-${WBpe - 1})) AS s,
         |    unnest(list_transform(range(len(t)-${WBpe - 1}),
         |      i -> array_to_string(list_slice(t, i+1, i+$WBpe), ' '))) AS ng
         |  FROM d2 WHERE len(t) >= $WBpe),
         |dup AS (SELECT ng FROM occ GROUP BY ng HAVING count(*) >= 2),
         |ds AS (SELECT o.doc_id, o.s FROM occ o JOIN dup USING (ng)),
         |r0 AS (SELECT doc_id, s,
         |  CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) = 1
         |       THEN 0 ELSE 1 END AS nr FROM ds),
         |r1 AS (SELECT doc_id, s,
         |  sum(nr) OVER (PARTITION BY doc_id ORDER BY s) AS rid FROM r0),
         |runs AS (SELECT doc_id, min(s) AS s0, max(s) + $WBpe AS e
         |         FROM r1 GROUP BY doc_id, rid),
         |rh AS (SELECT r.doc_id, r.s0, r.e,
         |  md5(array_to_string(list_slice(d2.t, r.s0+1, r.e), ' ')) AS h
         |  FROM runs r JOIN d2 USING (doc_id)),
         |el AS (SELECT h, min(doc_id * $PosCap + s0) AS ck,
         |       count(*) AS cnt FROM rh GROUP BY h),
         |cuts AS (SELECT rh.doc_id, rh.s0, rh.e FROM rh JOIN el USING (h)
         |         WHERE el.cnt >= 2 AND rh.doc_id * $PosCap + rh.s0 <> el.ck),
         |tok AS (SELECT doc_id, unnest(range(len(t))) AS p,
         |        unnest(t) AS tok FROM d2),
         |ev AS (
         |  SELECT doc_id, p, tok, CAST(NULL AS BIGINT) AS e,
         |    FALSE AS iscut FROM tok
         |  UNION ALL
         |  SELECT doc_id, s0 AS p, NULL AS tok, e, TRUE AS iscut FROM cuts),
         |mk AS (SELECT doc_id, p, tok, iscut,
         |  max(e) OVER (PARTITION BY doc_id ORDER BY p, iscut DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cut_until
         |  FROM ev),
         |kept AS (SELECT doc_id, p, tok FROM mk
         |         WHERE NOT iscut AND (cut_until IS NULL OR cut_until <= p)),
         |agg AS (SELECT doc_id, count(*) AS kept_tokens,
         |        md5(string_agg(tok, ' ' ORDER BY p)) AS clean_md5
         |        FROM kept GROUP BY doc_id)
         |SELECT d2.doc_id,
         |  CAST(len(d2.t) AS INTEGER) AS n_tokens,
         |  CAST(len(d2.t) - coalesce(a.kept_tokens,0) AS BIGINT) AS cut_tokens,
         |  CAST(coalesce(a.kept_tokens,0) AS BIGINT) AS kept_tokens,
         |  coalesce(a.clean_md5, md5('')) AS clean_md5
         |FROM d2 LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "pipe_span_clean_stats" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(range(len(t)-${N - 1})) AS s,
         |    unnest(list_transform(range(len(t)-${N - 1}),
         |      i -> t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5])) AS ng
         |  FROM docs WHERE len(t) >= $N),
         |canon AS (SELECT ng, min(doc_id * $PosCap + s) AS ck
         |          FROM occ GROUP BY ng HAVING count(*) >= 2),
         |cuts AS (SELECT o.doc_id, o.s FROM occ o JOIN canon c USING (ng)
         |         WHERE o.doc_id * $PosCap + o.s <> c.ck),
         |tok AS (SELECT doc_id, unnest(range(len(t))) AS p FROM docs),
         |ev AS (
         |  SELECT doc_id, p, FALSE AS iscut FROM tok
         |  UNION ALL
         |  SELECT doc_id, s AS p, TRUE AS iscut FROM cuts),
         |marked AS (
         |  SELECT doc_id, p, iscut,
         |    max(CASE WHEN iscut THEN p END) OVER
         |      (PARTITION BY doc_id ORDER BY p
         |       RANGE BETWEEN ${N - 1} PRECEDING AND CURRENT ROW) AS lastcut
         |  FROM ev),
         |agg AS (SELECT doc_id, count(*) AS kept FROM marked
         |        WHERE NOT iscut AND lastcut IS NULL GROUP BY doc_id),
         |per AS (SELECT d.doc_id, len(d.t) AS n_tokens,
         |               coalesce(a.kept, 0) AS kept
         |        FROM docs d LEFT JOIN agg a USING (doc_id))
         |SELECT m.lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(p.kept) AS BIGINT) AS kept_tokens,
         |  CAST(sum(p.n_tokens - p.kept) AS BIGINT) AS cut_tokens
         |FROM per p JOIN documents m USING (doc_id)
         |GROUP BY m.lang ORDER BY m.lang""".stripMargin
  )
}
