package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.Tables._
import graft.functions.Hashing

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table. Extension layer (brief: language-ID, quality
  * scoring, token counting, document fingerprinting). All operators are
  * narrow projections + one aggregation at most — the shapes that stay
  * scan-bound at 100 TB.
  *
  * Tokenization is a single-space split: portable bit-for-bit between
  * Spark `split(text, ' ')` and DuckDB `string_split(text, ' ')`
  * (both keep interior/trailing empties the same way).
  */
object TextAnalysis {

  private def toks(s: SparkSession, d: String): DataFrame =
    documents(s, d).withColumn("toks", split(col("text"), " "))

  /** Per-language corpus profile: doc count, char volume, average
    * tokens — one partial-agg shuffle on a low-cardinality key.
    */
  def t1LangProfile(s: SparkSession, d: String): DataFrame =
    toks(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        round(avg(size(col("toks"))), 4).as("avg_tokens"))
      .orderBy("lang")

  /** Per-document token statistics: whitespace token count, distinct
    * count, type-token ratio. Pure projection. The ratio is reported in
    * floor'd basis points: `round()` tie-breaking differs between
    * engines on exact .xxxx5 values, `floor` of an identical double
    * never does.
    */
  def t2TokenStats(s: SparkSession, d: String): DataFrame =
    toks(s, d)
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        floor(size(array_distinct(col("toks"))).cast("double") * 10000.0 /
          size(col("toks"))).cast("long").as("ttr_bp"))
      .orderBy("doc_id")

  /** Global top-20 token bigrams: explode n-grams → count → top-k.
    * Explode fans out ~|tokens| rows but the aggregate is map-side
    * partial, and the top-20 is TakeOrderedAndProject — no global sort.
    */
  def t3TopNgrams(s: SparkSession, d: String): DataFrame =
    toks(s, d)
      .filter(size(col("toks")) >= 2)
      // explode the cheap index sequence, build the n-gram after the
      // generator — exploding a transform-built array makes constraint
      // inference evaluate the whole array twice per row (see
      // Dedup.minhashSigs)
      .select(col("toks"),
        explode(expr("sequence(0, size(toks)-2)")).as("i"))
      .select(expr(
        "concat_ws(' ', element_at(toks, i+1), element_at(toks, i+2))")
        .as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("ngram"))
      .limit(20)

  /** Quality score: length saturation + non-stopword density, the
    * standard cheap pre-filter before expensive pipeline stages.
    * Reported in floor'd basis points: `n_chars/1000` puts a trailing 5
    * in the 4th decimal for every odd n_chars, and Spark/DuckDB round()
    * break that tie differently — floor of the identical double is
    * deterministic in both.
    */
  def t4QualityScore(s: SparkSession, d: String): DataFrame =
    toks(s, d)
      .withColumn("stop_hits", expr(
        "size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'in')))"))
      .select(
        col("doc_id"),
        col("stop_hits"),
        floor(
          (least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.5 +
            (lit(1.0) - col("stop_hits").cast("double") / size(col("toks"))) * 0.5)
            * 10000.0).cast("long").as("quality_bp"))
      .orderBy("doc_id")

  /** Language-ID heuristic: stopword-list hit counts per candidate
    * language, argmax with a deterministic tie-break order
    * (en > de > es > und). A real pipeline would use char-n-gram
    * profiles; the *shape* (narrow projection, no shuffle) is identical.
    */
  def t5LangId(s: SparkSession, d: String): DataFrame =
    toks(s, d)
      .withColumn("hits_en", expr(
        "size(filter(toks, x -> x IN ('the', 'a', 'and', 'of')))"))
      .withColumn("hits_de", expr(
        "size(filter(toks, x -> x IN ('der', 'die', 'das', 'und')))"))
      .withColumn("hits_es", expr(
        "size(filter(toks, x -> x IN ('el', 'la', 'los', 'y')))"))
      .select(
        col("doc_id"), col("lang"),
        when(col("hits_en") >= col("hits_de") &&
          col("hits_en") >= col("hits_es") && col("hits_en") > 0, "en")
          .when(col("hits_de") >= col("hits_es") && col("hits_de") > 0, "de")
          .when(col("hits_es") > 0, "es")
          .otherwise("und").as("lang_pred"))
      .orderBy("doc_id")

  /** BPE-ish regex token counting (the brief's second tokenizer): runs
    * of letters, runs of digits, or single other non-space chars — the
    * pre-tokenization split GPT-style BPE vocabularies apply before
    * merges. Counted next to the whitespace count so drift between the
    * two measures (punctuation-heavy docs) is visible.
    */
  def t7RegexTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Two-pass exact heavy hitters via the Misra-Gries sketch (brief's
    * "novel sketch" slot): tokens appearing in ≥ 1/500th of the token
    * stream. Pass 1 reduces the stream to ≤ k=1000 candidate counters
    * per map task ([[graft.functions.FreqSketchAggregator]] — the
    * shuffle carries k rows per task, NOT one per distinct token, the
    * plain groupBy's billions-of-keys trap at 100 TB); the MG bound
    * (undercount ≤ n/(k+1) < n/500) guarantees the candidate set is a
    * SUPERSET of the answer. Pass 2 exact-counts only candidate tokens
    * (broadcast array_contains filter) and applies the threshold —
    * deterministic exact output, so a plain GROUP BY ... HAVING oracle
    * applies. Threshold in integer math both sides: ceil(n/500) =
    * (n + 499) div 500 — a float 0.002·n could round differently
    * across engines at an exact boundary.
    */
  def t8FrequentTokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = toks(s, d).select(explode(col("toks")).as("token"))
    val sketch = new graft.functions.FreqSketchAggregator(1000).toColumn
    // sketch + total in ONE typed select = one pass over the token
    // stream (a separate count() would re-scan the whole corpus)
    val cands = tok.as[String]
      .select(sketch.name("cands"),
        count(lit(1)).cast("long").as("n_total").as[Long])
      .toDF("cands", "n_total")
    tok
      .join(broadcast(cands))
      .filter(array_contains(col("cands"), col("token")))
      .groupBy(col("token"), col("n_total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= expr("(n_total + 499) div 500"))
      .select(col("token"), col("cnt"))
      .orderBy(desc("cnt"), asc("token"))
  }

  /** Stratified deterministic sample (the corpus-rebalancing step of
    * curation): downsample the dominant language to 25%, keep the rest
    * at 80%. Semantics + scale shape in [[graft.ops.Sampling]] — a
    * content-keyed coin, reproducible across runs/engines/topologies,
    * which is exactly why it CAN be oracle-checked (a rand() sample
    * can't).
    */
  /** t16: temperature mixture rebalancing (τ=0.5) over the skewed
    * language distribution — rates computed from the corpus itself, see
    * [[graft.ops.Sampling.temperatureMix]].
    */
  def t16TemperatureMix(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.temperatureMix(
        documents(s, d), col("lang"), col("doc_id"),
        targetRows = 250, salt = "mix")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  def t9StratifiedSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.stratified(
        documents(s, d), col("lang"), col("doc_id"),
        rates = Map("en" -> 0.25), defaultRate = 0.8, salt = "s1")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Sequence packing (t10): assign each doc to a fixed token-budget
    * context window — the batching step between curation and training.
    * Greedy-in-order packing is inherently sequential; the scalable
    * relational form is the DISTRIBUTED PREFIX SUM over (lang, doc_id)
    * order ([[graft.ops.PrefixSum.runningBefore]] — r13 verdict #1:
    * the previous `Window.partitionBy("lang")` running sum was a
    * single-task-per-language sort, a ~20 TB-one-reducer ceiling on a
    * real cluster; the two-pass form is bit-identical and every window
    * task holds ≤ 4096 rows at any corpus size): pack_id = (tokens
    * accumulated before this doc) div budget. Docs longer than the
    * budget still get a pack (their own, plus spillover — the
    * downstream splitter's contract, same as real pipelines).
    * Deterministic given the (shard, doc_id) order, hence
    * oracle-checkable. The slim per-doc totals are checkpointed once —
    * the prefix sum consumes them twice (subtotals + main pass) and
    * the tokenize must not run twice.
    */
  def t10PackDocs(s: SparkSession, d: String, budget: Int = 2048): DataFrame =
    packAssignment(
      toks(s, d).withColumn("n_tokens", size(col("toks")))
        .select("doc_id", "lang", "n_tokens").localCheckpoint(),
      budget.toLong)
      .orderBy("doc_id")

  /** The shared packing step: exclusive prefix sum of `n_tokens` over
    * (lang, doc_id) order → pack_id — t10 in whitespace units, t35 in
    * trained-BPE units (same formula, same plan; ChunkingSpec pins the
    * boundary contract for both). Unordered — each caller applies its
    * own output order.
    *
    * ADJUDICATED COST (r14 "What's wrong #1", the driver's t10 2.37×
    * flag): the two-pass prefix sum costs a measured ~0.4 s CONSTANT
    * over the single-window form — PACK_DRIFT_R15.json: +0.456 s at
    * sf0.1, +0.395 s at sf1 (10× the data, SAME constant; outputs
    * asserted equal) — i.e. plan-stage overhead (four extra stages),
    * not a scale law. The trade is accepted as-is: the constant is
    * noise at any tier where packing matters, while the window form's
    * partition-per-language serializes ~20 TB into one task at the
    * target scale. No size gate — a plan that flips to the degenerate
    * form at exactly the tiers the bench measures would be tuning for
    * the benchmark, not the cluster.
    */
  private def packAssignment(slim: DataFrame, budget: Long): DataFrame =
    graft.ops.PrefixSum.runningBefore(
        slim, "lang", "doc_id", "n_tokens", "tok_before")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"tok_before div ${budget}L").as("pack_id"))

  /** The PRE-r13 single-window t10 — retained ONLY as the r14 bench
    * drift adjudication comparator (tools/PackDriftDiag): bit-identical
    * output, but `Window.partitionBy(lang)` serializes each language
    * into one task at scale, which is why production t10 runs the
    * two-pass prefix sum. Never registered as a query.
    */
  private[graft] def t10PackDocsWindowForm(s: SparkSession, d: String,
      budget: Int = 2048): DataFrame = {
    val slim = toks(s, d).withColumn("n_tokens", size(col("toks")))
      .select("doc_id", "lang", "n_tokens").localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    slim.withColumn("tok_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"tok_before div ${budget}L").as("pack_id"))
      .orderBy("doc_id")
  }

  /** t17: materialized pack payloads — the step after [[t10PackDocs]]'
    * assignment: each (shard, pack) concatenates its member docs (in
    * doc_id order, `<eos>`-separated) into the actual training-context
    * payload, with doc/token accounting. The assignment is the shared
    * distributed prefix sum ([[packAssignment]]); text joins back on
    * doc_id AFTER it, so the heavy payload column rides two bounded
    * exchanges (doc_id join + pack agg) and never enters a window.
    * `collect_list` is per-pack bounded — a pack holds ≈ budget tokens
    * by construction, so the agg buffer is context-window-sized, never
    * corpus-sized. Rebuild order is forced by array_sort on
    * (doc_id, text) structs (collect_list itself is unordered).
    */
  def t17PackPayloads(s: SparkSession, d: String, budget: Int = 2048): DataFrame =
    packPayloads(
      packAssignment(
        toks(s, d).withColumn("n_tokens", size(col("toks")))
          .select("doc_id", "lang", "n_tokens").localCheckpoint(),
        budget.toLong),
      documents(s, d))

  /** The shared payload step over a pack assignment (t17/t36).
    *
    * Byte-law adjudication (SCALE_NEW_R14_10to100 read bexp ~1.19 for
    * both payload queries): tools/PackBytesDiag decomposed the legs —
    * the slim assignment is exactly linear (0.9 → 9.4 MB at 10×), and
    * the jump is the text join's assignment side crossing the 10 MB
    * auto-broadcast threshold between the tiers (join leg 0.9 MB
    * broadcast at sf1 → 193 MB shuffled at sf10), i.e. the one-time
    * broadcast→shuffle TRANSITION ScaleBench's no-broadcast protocol
    * exists to separate, not a law: with broadcasts forced off on
    * both tiers the exponents read 1.023 / 1.014
    * (SCALE_R14_PACK_BCASTOFF.json) — linear on either side of the
    * threshold.
    */
  private def packPayloads(assigned: DataFrame, docs: DataFrame): DataFrame =
    assigned
      .join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("lang", "pack_id")
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        sum("n_tokens").as("pack_tokens"),
        expr("""array_join(transform(
            array_sort(collect_list(struct(doc_id, text))), x -> x.text),
            ' <eos> ')""").as("payload"))
      .orderBy("lang", "pack_id")

  /** t19: overlapping token-window chunking (size 40, stride 30) — the
    * doc→chunk explode that precedes embedding/RAG indexing. Pure
    * narrow explode: chunk count is integer ceil-division
    * (1 + ⌈(n−size)/stride⌉, engine-exact), chunk text a clamped
    * slice+join. At 100 TB this is scan-bound fan-out; the downstream
    * embedder sees (doc_id, chunk_id) keys that sort back
    * deterministically.
    */
  def t19ChunkDocs(s: SparkSession, d: String,
      chunkSize: Int = 40, stride: Int = 30): DataFrame =
    toks(s, d)
      .withColumn("n", size(col("toks")))
      .withColumn("chunk_id", explode(expr(
        s"sequence(0, CASE WHEN n > $chunkSize THEN (n - $chunkSize + ${stride - 1}) div $stride ELSE 0 END)")))
      .select(
        col("doc_id"), col("chunk_id"),
        least(lit(chunkSize), col("n") - col("chunk_id") * stride)
          .cast("int").as("n_chunk_tokens"),
        expr(s"array_join(slice(toks, CAST(chunk_id * $stride + 1 AS INT), $chunkSize), ' ')")
          .as("chunk"))
      .orderBy("doc_id", "chunk_id")

  /** Per-doc quality in basis points — t4's formula as a reusable
    * column over a `toks`-bearing frame.
    */
  private val qualityBp =
    floor(
      (least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.5 +
        (lit(1.0) - expr(
          "size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'in')))")
          .cast("double") / size(col("toks"))) * 0.5)
        * 10000.0).cast("long")

  /** t20: domain-level filtering — the per-SOURCE quality scorecard
    * (the UT1-blocklist/domain-filter analogue: a source whose MEAN
    * quality is poor gets dropped wholesale, docs unseen). Mean is
    * integer-division of int64 sums — order-independent, engine-exact.
    * One partial-agg shuffle on the low-cardinality source key; the
    * doc-level filter is then a broadcast semi-join
    * ([[filterSources]]).
    */
  def t20SourceFilter(s: SparkSession, d: String,
      minMeanBp: Long = 7450): DataFrame =
    toks(s, d)
      .withColumn("q_bp", qualityBp)
      .groupBy("source")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        expr("CAST(sum(q_bp) div count(1) AS BIGINT)").as("mean_q_bp"))
      .withColumn("kept", col("mean_q_bp") >= minMeanBp)
      .orderBy("source")

  /** Docs surviving the domain filter: semi-join against the kept
    * sources (broadcast — the source list is tiny).
    */
  def filterSources(s: SparkSession, d: String,
      minMeanBp: Long = 7450): DataFrame = {
    val kept = t20SourceFilter(s, d, minMeanBp)
      .filter(col("kept")).select("source")
    documents(s, d).join(broadcast(kept), Seq("source"), "left_semi")
  }


  /** t21: token-rarity scoring — the mean corpus frequency (ppm) of a
    * doc's tokens, plus its rarest token's frequency: a low mean marks
    * rare/OOD/gibberish-leaning text, the cheap LM-free perplexity
    * proxy quality pipelines use before any model-based filter.
    * Shape: one explode+agg builds the (token, freq_ppm) vocabulary;
    * the token stream then joins it back on token — a SHUFFLE
    * equi-join, deliberately: the vocabulary grows with the corpus, so
    * no broadcast (contrast t8, which broadcasts a k-bounded sketch).
    * The corpus total rides in as a broadcast single-row frame; all
    * arithmetic is integer ppm, order-independent.
    */
  def t21TokenRarity(s: SparkSession, d: String): DataFrame = {
    val tokStream = toks(s, d)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    val counts = tokStream.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // the total is Σcnt over the TINY grouped relation — no third
    // corpus scan (the t11 trick); identical `counts` subtrees dedup
    // via ReuseExchange. DECIMAL(38,0) for the ppm scale-up: cnt·10⁶
    // overflows int64 at ~10¹³ corpus tokens (the toWeightBudget fix).
    val total = counts.agg(sum("cnt").as("n_total"))
    val vocab = counts
      .join(broadcast(total))
      .select(col("tok"),
        expr("CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000) div n_total AS BIGINT)")
          .as("freq_ppm"))
    tokStream.join(vocab, "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        expr("CAST(sum(freq_ppm) div count(1) AS BIGINT)")
          .as("mean_freq_ppm"),
        min("freq_ppm").as("rarest_ppm"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: a sequential polynomial rolling hash over
    * token hashes (order-sensitive) and a canonical bag-of-words md5
    * (order-insensitive). Both pure projections; either can drive an
    * exact-dedup group-by at scale.
    */
  def t6Fingerprint(s: SparkSession, d: String): DataFrame = {
    val tokH = Hashing.h32Sql("x")
    toks(s, d)
      .select(
        col("doc_id"),
        expr(
          s"""aggregate(transform(toks, x -> $tokH % 1000000007L), 0L,
             |  (acc, h) -> (acc * 31 + h) % 1000000007L)""".stripMargin)
          .as("fp_rolling"),
        md5(expr(
          "array_join(array_sort(array_distinct(toks)), ' ')"))
          .as("fp_canonical"))
      .orderBy("doc_id")
  }

  /** Token-budget sample (t12): "give me ~20k tokens of this corpus" —
    * the budget→rate conversion in [[graft.ops.Sampling.toWeightBudget]]
    * (one partial-agg total + a deterministic integer-threshold coin;
    * the exact greedy cut-off would be a one-task global running sum).
    * The same budget self-adapts across scale factors: at sf0.01 it
    * keeps ~3/4 of the corpus, at sf0.1 ~7%.
    */
  def t12TokenBudgetSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.toWeightBudget(
        toks(s, d).select(col("doc_id"), size(col("toks")).as("n_tokens")),
        col("doc_id"), col("n_tokens"), budget = 20000L, salt = "tb")
      .orderBy("doc_id")

  /** Repetition score (t13): fraction of duplicate 3-grams within each
    * doc — the "repetitious text" quality signal (looping generations,
    * keyword stuffing, boilerplate-heavy pages score high). Pure narrow
    * projection like t2/t4; reported in floor'd basis points (round()
    * half-ties differ across engines, floor of an identical double
    * never does).
    */
  def t13Repetition(s: SparkSession, d: String): DataFrame =
    toks(s, d)
      .filter(size(col("toks")) >= 3)
      .withColumn("n_grams", (size(col("toks")) - 2))
      .withColumn("n_distinct", size(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', element_at(toks, i+1),
          |    element_at(toks, i+2), element_at(toks, i+3))))""".stripMargin)))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        floor((col("n_grams") - col("n_distinct")).cast("double") * 10000.0 /
          col("n_grams")).cast("long").as("rep_bp"))
      .orderBy("doc_id")

  /** TF-IDF top terms (t11): the classic per-document keyword extractor.
    * Term frequency from one explode + (doc_id, term) aggregate; document
    * frequency from a second aggregate over the SAME tf relation (each
    * (doc, term) pair already distinct — no second corpus scan); corpus
    * size joined in as a broadcast single-row frame (t8's pattern — no
    * driver-side collect). Top-3 terms per doc via a row_number window
    * on (score desc, term asc).
    *
    * The score is linear-idf `tf · N / df`, not log-idf: per term, N/df
    * is a monotone transform of log(N/df), and — the reason it is chosen
    * here — it stays inside correctly-rounded IEEE multiply/divide, so
    * Spark and DuckDB produce bit-identical doubles and identical ranks.
    * `Math.log` carries no such cross-engine guarantee. Production runs
    * that need comparable-across-terms log damping can post-map the
    * score; the selected terms are what the operator is for.
    *
    * Scale shape: explode is scan-bound; tf aggregate shuffles on
    * (doc_id, term) with map-side partials; df aggregate reuses tf
    * (vocabulary-sized, shuffled on term — NOT broadcast: a 100 TB
    * corpus's vocabulary doesn't fit an executor); the final window
    * shuffles on doc_id. No step is ever all-pairs or driver-bound.
    */
  def t11TfidfTop(s: SparkSession, d: String): DataFrame = {
    val tf = toks(s, d)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents(s, d).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score"), asc("term"))
    tf.join(df, "term")
      .join(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n") / col("df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rn"))
      .orderBy("doc_id", "rn")
  }

  /** t28: adjacent symbol-pair counts — the inner loop of BPE
    * tokenizer training. Each merge iteration of BPE is exactly this
    * query over the current symbol sequence: count within-word
    * adjacent character pairs corpus-wide, take the most frequent as
    * the next merge. Run here at the character level (iteration 0) on
    * lowercased whitespace words; the top-30 table is the
    * merge-candidate ranking.
    *
    * Explode hygiene (t3's rule): explode the cheap index sequence,
    * then build the 2-char substring AFTER the generator — exploding a
    * transform-built array makes constraint inference evaluate the
    * whole array twice per row. The `length >= 2` guard must precede
    * the sequence: Spark's `sequence(1, 0)` is the DESCENDING [1, 0],
    * not empty.
    *
    * Scale shape: the explode fans out ~|corpus chars| rows, but the
    * aggregate is map-side partial over a tiny key domain (alphabet²),
    * so the exchange carries ≤ |pairs|·|tasks| rows and the top-30 is
    * TakeOrderedAndProject — no global sort, no second pass. Positions
    * are code points in both engines (ASCII-safe; astral-plane corpora
    * would need a grapheme tokenizer upstream).
    */
  def t28BpePairs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(expr("sequence(1, length(w)-1)")).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(30)

  /** t30: BPE-merge TRAINING — the full iterative tokenizer-training
    * loop t28 is the first step of: learn the [[BpeMerges]] highest-
    * count merges, each round re-counting symbol pairs over the state
    * the previous merges produced. The output (rank, pair, merged,
    * count) IS a trained tokenizer prefix — the artifact a 100 TB
    * text pipeline ships to its tokenization stage.
    *
    * Scale design — the classic word-frequency CONTRACTION: BPE
    * statistics over a corpus are identical computed over
    * (distinct word, count), so the corpus is scanned ONCE into a
    * vocab-sized table and all [[BpeMerges]] rounds iterate on that
    * contraction (sf0.01: 60 k raw words → 8.5 k distinct states).
    * Each round is one explode + map-side-combinable sum over the
    * vocab, a 1-row argmax collect (parameter-bounded, the PQ-codebook
    * precedent), and a narrow per-row merge application; the state is
    * checkpointed per round (the g1 lineage materializer).
    *
    * Merge application semantics (pinned, engine-portable): the state
    * is the space-padded symbol string (" a b c "); applying merge
    * (l, r) = literal replace of " l r " with " lr ", repeated
    * [[BpeReplacePasses]] times. Literal replace is a left-to-right
    * non-overlapping scan in BOTH engines (Java String semantics ==
    * DuckDB replace), and each pass consumes the shared boundary
    * space of back-to-back occurrences, so the fixed pass count makes
    * the result exactly reproducible cross-engine. On runs of the
    * merged pair ("y y y y") this differs from the array-greedy form
    * (which would pair strictly left-to-right); the oracle runs the
    * SAME pass-limited replace, so the semantics — like the LSH
    * oracles' — is the pinned contract, not an approximation of one.
    */
  private[graft] val BpeMerges = 10
  private[graft] val BpeReplacePasses = 4

  /** Memoized training: t30 and t31 share ONE training run per
    * (session, corpus content) — the CorpusIndexCache recipe, with the
    * merge list riding alongside the state DataFrame (which alone
    * can't carry it). The state is driver-resident from the in-memory
    * trainer, so a cache hit costs nothing; a rewritten corpus changes
    * the signature and re-trains; stopped sessions sweep lazily.
    *
    * PERSISTED-ARTIFACT serving (r14 verdict #3): before training,
    * consult the stamp-persisted tokenizer tables ([[persistBpe]]) —
    * a FRESH SESSION then loads the parameter-sized merge list + the
    * vocab-sized word state instead of paying a full retrain, the
    * cheapest artifact-vs-recompute win in the repo. The served leg is
    * NOT memoized in [[bpeCache]] (its plan would dangle across a
    * compact/drop, the ADVICE r13 #1 failure mode the table caches
    * solved with invalidateAll — which this private memo doesn't
    * subscribe to); serving costs one metastore check + a vocab-sized
    * collect per call, noise next to any consumer query.
    */
  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String),
    (String, DataFrame, Seq[(Int, String, String, Long)])]()
  /** Test hook: simulate a fresh session (the persisted-artifact
    * serving path is only reachable when the memo misses).
    */
  private[graft] def evictBpeMemo(): Unit = bpeCache.clear()
  private def bpeTrained(s: SparkSession, d: String)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    bpeCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val path = s"$d/documents.parquet"
    val sig = graft.lake.CorpusIndexCache.signature(path)
    val cur = bpeCache.get((s, path))
    if (cur != null && cur._1 == sig) return (cur._2, cur._3)
    servedBpe(s, d) match {
      case Some(r) => r
      case None =>
        val e = bpeCache.compute((s, path), (_, c) =>
          if (c != null && c._1 == sig) c
          else { val (w, m) = trainBpe(s, d); (sig, w, m) })
        (e._2, e._3)
    }
  }

  // ---- persisted tokenizer artifact (r14 verdict #3) -----------------
  // TWO stamped tables per corpus: `bpem` holds the parameter-sized
  // merge list (rank, pair, merged, cnt, trained_bytes) and `bpest`
  // the vocab-sized post-merge word state (state, n) — together the
  // full trained-tokenizer artifact every t30–t37 consumer derives
  // from. Unlike the index families the artifact is CORPUS-GLOBAL
  // (word counts move every merge decision), so there is no sound
  // append — maintenance is a retrain POLICY ([[maintainBpe]]):
  // "always" re-trains per nightly (today's behavior, exactness), and
  // "on-doubling" freezes the tokenizer until the corpus doubles in
  // bytes (the ANN ladder precedent — production tokenizers are
  // shipped frozen artifacts, and a <2× increment cannot usefully
  // move a vocab trained on the other half).

  private val BpeMergesPrefix = "bpem"
  private val BpeStatePrefix = "bpest"
  private def bpePath(d: String): String = s"$d/documents.parquet"

  /** Total bytes of the corpus files — the doubling gauge
    * [[maintainBpe]]'s on-doubling policy reads (one FS listing; no
    * data scan).
    */
  private def corpusBytes(s: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.getContentSummary(p).getLength
  }

  /** Persist the trained tokenizer for tier `d`: train (or reuse the
    * session memo), then stamp-persist merge list + word state through
    * the IndexTables staging-swap lifecycle.
    */
  def persistBpe(s: SparkSession, d: String): Seq[String] = {
    val (words, merges) = bpeTrained(s, d)
    import s.implicits._
    val bytes = corpusBytes(s, bpePath(d))
    val mergesDf = merges.toDF("rank", "pair", "merged", "cnt")
      .withColumn("trained_bytes", lit(bytes))
    Seq(
      graft.lake.IndexTables.persist(s, mergesDf, BpeMergesPrefix,
        bpePath(d), Seq("rank"), buckets = 1),
      graft.lake.IndexTables.persist(s, words, BpeStatePrefix,
        bpePath(d), Seq("state"), buckets = 8))
  }

  /** Drop both tokenizer tables for tier `d`, if any. */
  def dropBpe(s: SparkSession, d: String): Unit = {
    graft.lake.IndexTables.drop(s, BpeMergesPrefix, bpePath(d))
    graft.lake.IndexTables.drop(s, BpeStatePrefix, bpePath(d))
  }

  /** The merges table's current stamp — [[maintainBpe]]'s prevSig
    * handle (both tables persist together; one stamp witnesses both).
    */
  def bpeStamp(s: SparkSession, d: String): Option[String] =
    graft.lake.IndexTables.stampOf(s, BpeMergesPrefix, bpePath(d))

  /** The persisted tokenizer, if BOTH tables serve fresh: the word
    * state as the served table scan, the merge list collected
    * (parameter-sized by construction).
    */
  private def servedBpe(s: SparkSession, d: String)
      : Option[(DataFrame, Seq[(Int, String, String, Long)])] =
    for {
      m <- graft.lake.IndexTables.serve(s, BpeMergesPrefix, bpePath(d))
      st <- graft.lake.IndexTables.serve(s, BpeStatePrefix, bpePath(d))
    } yield (st.select("state", "n"),
      m.orderBy("rank").collect().toSeq
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))))

  /** NIGHTLY tokenizer maintenance: after a docs delta lands, either
    * retrain + re-persist (policy "always" — the exactness posture:
    * served ≡ retrain on the grown corpus, BpeTrainSpec) or, under
    * "on-doubling", keep the FROZEN artifact and only move its stamps
    * (an empty-increment re-stamp on both tables) until the corpus
    * bytes reach 2× the bytes it was trained on — then pay the
    * retrain. Same caller contract as every appendIncrement: prevSig
    * read before the delta landed.
    */
  /** Returns TRUE when the tokenizer was retrained (merges may have
    * moved — [[maintainBpeStream]] keys its re-persist-vs-append
    * decision on it), FALSE when the frozen artifact was re-stamped.
    */
  def maintainBpe(s: SparkSession, d: String, prevSig: String,
      policy: String = "always"): Boolean = {
    val stamp = bpeStamp(s, d)
    if (!stamp.contains(prevSig))
      throw new IllegalStateException(
        s"maintainBpe($d): table stamp $stamp != expected $prevSig — " +
          "corpus or table changed under the maintainer")
    // peek, not serve: the delta already landed, so the table's stamp
    // legitimately trails the corpus here — serve() would drop it as
    // stale, destroying the artifact this policy exists to keep
    def restampBoth(): Unit = {
      val empty = graft.lake.IndexTables
        .peek(s, BpeMergesPrefix, bpePath(d)).get.limit(0)
      graft.lake.IndexTables.appendIncrement(s, empty, BpeMergesPrefix,
        bpePath(d), prevSig)
      val emptySt = graft.lake.IndexTables
        .peek(s, BpeStatePrefix, bpePath(d)).get.limit(0)
      graft.lake.IndexTables.appendIncrement(s, emptySt, BpeStatePrefix,
        bpePath(d), prevSig)
    }
    policy match {
      case "always" => persistBpe(s, d); true
      case "on-doubling" =>
        val trainedBytes = graft.lake.IndexTables
          .peek(s, BpeMergesPrefix, bpePath(d)).get
          .select("trained_bytes").limit(1).collect()(0).getLong(0)
        if (corpusBytes(s, bpePath(d)) >= 2L * trainedBytes) {
          persistBpe(s, d); true
        } else { restampBoth(); false }
      case other => throw new IllegalArgumentException(
        s"maintainBpe: unknown policy '$other' (always | on-doubling)")
    }
  }

  /** The word-frequency contraction the trainer iterates on:
    * (space-padded symbol state, count) over distinct lowercased words
    * of length ≥ 2 — ONE distributed corpus scan, vocab-sized output.
    */
  private def bpeContraction(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))
        .as("state"), col("n"))

  /** Contraction-collect cap (r14 verdict #4): the in-memory trainer
    * collects the contraction ORDERED BY (count desc, state asc) and
    * keeps the top [[BpeContractionCap]] word states — the standard
    * tokenizer-training posture (production BPE trainers operate on a
    * capped word-frequency table; the count-ordered cut drops only the
    * rarest-word tail, whose pair mass is the least able to move any
    * merge decision). Below the cap — every tier this repo measures,
    * and any corpus whose VOCABULARY fits a driver, which Heaps' law
    * makes the common case even at 100 TB — training is EXACT:
    * BpeTrainSpec pins bit-equality with [[trainBpeDistributed]].
    * Above it, the merge list is the capped table's exact BPE, the
    * documented approximation.
    */
  private[graft] val BpeContractionCap = 2000000

  /** Spark's string `<` is an unsigned UTF-8 byte compare; Java's
    * compareTo is UTF-16 code-unit order. They agree on ASCII (this
    * corpus's pinned precondition) but the trainer ties must be
    * bit-portable for ANY input, so the in-memory argmax uses the
    * byte order Spark's `asc("pair")` sorts by.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The IN-MEMORY merge loop (r14 verdict #4): the contraction is
    * vocab-sized, so training belongs on the driver — the distributed
    * loop's per-merge Spark job (a full explode + argmax + replace +
    * checkpoint over the contraction, ~0.4 s each at toy scale) made a
    * production vocab (~30 k merges) 30 k SEQUENTIAL jobs, a scale
    * ceiling the distributed scan never had. Semantics are pinned
    * identical to [[trainBpeDistributed]]: same adjacent-pair counts
    * over the trimmed symbol split, same (count desc, UTF-8-byte pair
    * asc) argmax, same [[BpeReplacePasses]]-pass literal replace (Java
    * String.replace == Spark `replace` == DuckDB replace: left-to-right
    * non-overlapping). BpeTrainSpec pins bit-equality at merges=10 on
    * sf0.01; BPE_TRAIN_R15.json measures the merges=1000 run the old
    * loop could not complete in bench time.
    */
  private[graft] def trainBpeInMemory(
      contraction: Array[(String, Long)], nMerges: Int)
      : (Array[(String, Long)], Seq[(Int, String, String, Long)]) = {
    var states = contraction
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    while (i <= nMerges) {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      states.foreach { case (st, n) =>
        val syms = st.trim.split(" ")
        var j = 0
        while (j < syms.length - 1) {
          val p = syms(j) + " " + syms(j + 1)
          cnt.update(p, cnt.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      if (cnt.isEmpty) return (states, merges.result()) // corpus exhausted
      var bestPair: String = null
      var bestCnt = Long.MinValue
      cnt.foreach { case (p, c) =>
        if (c > bestCnt || (c == bestCnt && utf8Less(p, bestPair))) {
          bestPair = p; bestCnt = c
        }
      }
      val Array(l, r) = bestPair.split(" ", 2)
      merges += ((i, bestPair, l + r, bestCnt))
      val from = s" $l $r "
      val to = s" $l$r "
      states = states.map { case (st, n) =>
        if (!st.contains(from)) (st, n)
        else {
          var x = st
          var p = 0
          while (p < BpeReplacePasses) { x = x.replace(from, to); p += 1 }
          (x, n)
        }
      }
      i += 1
    }
    (states, merges.result())
  }

  /** The training entry: one distributed contraction scan, a capped
    * count-ordered collect, then [[trainBpeInMemory]]. Returns the
    * post-merge word state table (state, n) and the learned merge list.
    */
  private[graft] def trainBpe(s: SparkSession, d: String,
      nMerges: Int = BpeMerges)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    val collected = bpeContraction(s, d)
      .orderBy(desc("n"), asc("state")).limit(BpeContractionCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (states, merges) = trainBpeInMemory(collected, nMerges)
    import s.implicits._
    (states.toSeq.toDF("state", "n"), merges)
  }

  /** The per-merge DISTRIBUTED loop — retained as [[trainBpe]]'s spec
    * reference (BpeTrainSpec pins the in-memory trainer bit-equal to
    * it) and as the honest fallback for a contraction too large for
    * [[BpeContractionCap]] exactness.
    */
  private[graft] def trainBpeDistributed(s: SparkSession, d: String,
      nMerges: Int = BpeMerges)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    var words = bpeContraction(s, d).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    (1 to nMerges).foreach { i =>
      val top = words
        .select(col("n"), split(trim(col("state")), " ").as("syms"))
        .select(col("n"), explode(expr(
          "transform(slice(syms, 1, size(syms)-1)," +
            " (x, j) -> concat(x, ' ', element_at(syms, j + 2)))"))
          .as("pair"))
        .groupBy("pair").agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), asc("pair"))
        .limit(1).collect()(0)
      val pair = top.getString(0)
      val Array(l, r) = pair.split(" ", 2)
      merges += ((i, pair, l + r, top.getLong(1)))
      var st = col("state")
      (1 to BpeReplacePasses).foreach { _ =>
        st = replace(st, lit(s" $l $r "), lit(s" $l$r "))
      }
      words = words.select(st.as("state"), col("n")).localCheckpoint()
    }
    (words, merges.result())
  }

  def t30BpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeTrained(s, d)._2.toDF("rank", "pair", "merged", "cnt")
      .orderBy("rank")
  }

  /** t31: the trained VOCABULARY — the top-20 symbols by corpus
    * frequency after t30's merges are applied (single characters the
    * merges never consumed plus the learned multi-char units), i.e.
    * the apply side of BPE: what the tokenization stage actually
    * emits. Reuses [[bpeTrained]]'s contraction loop; the final pass
    * is one explode + sum over the vocab-sized state table with a
    * TakeOrderedAndProject top-20.
    */
  def t31BpeVocab(s: SparkSession, d: String): DataFrame = {
    val (words, _) = bpeTrained(s, d)
    words
      .select(col("n"), explode(split(trim(col("state")), " ")).as("sym"))
      .groupBy("sym").agg(sum("n").as("freq"))
      .orderBy(desc("freq"), asc("sym"))
      .limit(20)
  }

  /** t32: bigram language-model FLUENCY scoring — the perplexity-class
    * filter (CCNet, Wenzek et al. 2020; Gopher/MassiveText's "doc
    * quality by LM score") every pretraining-data pipeline runs after
    * the cheap t4 heuristics: train a bigram model on the corpus
    * itself, score each document by how probable its own word
    * transitions are under it, and surface the LEAST fluent documents —
    * shuffled/templated/outlier text whose transitions the corpus
    * doesn't support. Scoring is the MLE conditional probability in
    * integer ppm — p(w2|w1) = c(w1 w2)·1e6 div c(w1·) — summed per doc
    * and floor-averaged, so the whole pipeline is bigint arithmetic
    * and bit-portable cross-engine (the repo-wide no-transcendentals
    * determinism rule: a real deployment exponentiates to perplexity
    * for reporting; the RANKING — what the filter consumes — is
    * identical under any monotone transform).
    *
    * Scale shape (100 TB): the corpus explodes ONCE to bigram grain;
    * the model is two partial-aggregable shuffles (c12 on the bigram
    * key; c1 re-aggregates the MODEL relation, |distinct bigrams| ≪
    * |tokens|). The scoring join is bigram-keyed; per-doc reduction
    * partial-aggregates map-side on doc_id.
    *
    * Scope (ADVICE r11): this query scores the corpus AGAINST ITSELF —
    * every observed bigram is in the model by construction, so the
    * OOV floor in [[scoreAgainstModel]] never fires and the result is
    * the exact MLE self-score. Reusing the trained model on a LATER
    * batch goes through the same [[scoreAgainstModel]], whose left
    * join + floor is what makes unseen transitions score LOW instead
    * of silently dropping (spec-pinned on an all-OOV batch).
    */
  /** Word-transition grain of `docs(doc_id, text)` — the one explode
    * both model training and scoring run on.
    */
  private[graft] def docBigrams(docs: DataFrame): DataFrame = docs
    .withColumn("toks", split(lower(col("text")), " "))
    .filter(size(col("toks")) >= 2)
    .select(col("doc_id"), col("toks"),
      explode(expr("sequence(0, size(toks)-2)")).as("i"))
    .select(col("doc_id"),
      expr("element_at(toks, i+1)").as("w1"),
      expr("element_at(toks, i+2)").as("w2"))

  /** The trained MLE bigram model (w1, w2, p_ppm) — t32's persistable
    * artifact: two partial-aggregable shuffles (c12 on the bigram key;
    * c1 re-aggregates the model relation, |distinct bigrams| ≪
    * |tokens|). A production pipeline prunes count-1 tail bigrams
    * before persisting (where Heaps-law growth lives) and broadcasts
    * the pruned model into [[scoreAgainstModel]].
    */
  def bigramModel(docs: DataFrame): DataFrame = {
    val c12 = docBigrams(docs).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
    c12
      .join(c12.groupBy("w1").agg(sum("c12").as("c1")), "w1")
      .select(col("w1"), col("w2"),
        expr("c12 * 1000000 div c1").as("p_ppm"))
  }

  /** Score ANY batch against a trained model — the reuse path t32's
    * self-scoring query scopes out (ADVICE r11, now real code): the
    * scoring join is LEFT, and an unseen transition scores `floorPpm`
    * (add-k-style floor) instead of silently dropping — an inner join
    * would rate the least-fluent (all-unseen-transition) text as
    * fluent or omit it entirely, the opposite of the filter's purpose.
    * On the training corpus itself every bigram is in the model by
    * construction, so the floor never fires and this reduces exactly
    * to t32's self-scoring (spec-pinned). Output: every scorable doc
    * (≥ 2 tokens), least fluent first.
    */
  def scoreAgainstModel(batch: DataFrame, model: DataFrame,
      floorPpm: Long = 1L): DataFrame =
    docBigrams(batch).join(model, Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("p_ppm"), lit(floorPpm))).as("sp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sp div n_bigrams").as("avg_p_ppm"))
      .orderBy(asc("avg_p_ppm"), asc("doc_id"))

  def t32BigramLm(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    scoreAgainstModel(docs, bigramModel(docs)).limit(20)
  }

  /** t39: HELD-OUT LM scoring — the CCNet-style quality filter posture
    * t32's self-scoring cannot exercise: the bigram model trains on
    * one corpus split (even doc_ids — the "clean reference" side) and
    * scores the OTHER (odd — the "crawl" side), so unseen transitions
    * actually occur and [[scoreAgainstModel]]'s add-k floor fires on
    * real data — the left-join + floor path was previously pinned only
    * by a spec fixture; this puts it behind the DuckDB hash gate.
    * Output: the 20 least fluent held-out docs (the filter's cut
    * candidates). Plan: the model is reference-split-sized and joins
    * the scored side's bigram explode on (w1, w2) — the t32 shape with
    * the join flipped LEFT; at 100 TB the reference split is the small
    * side and broadcasts.
    */
  def t39LmHeldout(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    scoreAgainstModel(docs.filter(col("doc_id") % 2 === 1),
      bigramModel(docs.filter(col("doc_id") % 2 === 0))).limit(20)
  }

  /** The BPE APPLY kernel: fold `merges` (in rank order) over a spaced
    * symbol state, each as [[BpeReplacePasses]] literal-replace passes —
    * the exact semantics training pinned (`trainBpe`'s inner loop),
    * factored out so encoding provably applies what training learned.
    * With ZERO merges the state is untouched: encoding degenerates to
    * character splitting (spec-pinned), the BPE base case.
    */
  private[graft] def bpeApply(state: Column,
      merges: Seq[(String, String)]): Column =
    merges.foldLeft(state) { case (st, (pair, merged)) =>
      (1 to BpeReplacePasses).foldLeft(st)((acc, _) =>
        replace(acc, lit(s" $pair "), lit(s" $merged ")))
    }

  /** t33: corpus BPE ENCODING — the apply side that makes trained-token
    * counts real (r11 verdict #5): every document is tokenized with
    * t30's learned merges and reduced to its token/char/word counts in
    * TRAINED units — the number a token-budget sampler or packer should
    * meter, where t12/t17 today count whitespace splits. A whitespace
    * word costs `len(word)` tokens at 0 merges and one less per merge
    * that fires in it, so `n_tokens ≤ n_chars` always, with equality
    * exactly when no merge applies.
    *
    * Scale shape (100 TB): the merge list is PARAMETER-sized (10 rows,
    * driver-resident from [[bpeTrained]]'s memoized training) and
    * compiles into a literal-replace chain — a codegen'd projection, no
    * join, no broadcast table needed; the corpus is scanned once,
    * exploded to word grain, and re-aggregated per doc (one doc_id
    * shuffle with map-side partials — the t2 shape). Token counting is
    * arithmetic on the encoded state's space count, not a split+size
    * array walk.
    *
    * Encoding scope: all non-empty lowercased words (single-char words
    * pass through unmerged — a ≥2-symbol pattern cannot match them), so
    * the counts cover the WHOLE document; training's len≥2 filter is a
    * statistics choice, not an encoding constraint. The DuckDB oracle
    * replays the same trained chain from its own corpus scan.
    */
  def t33BpeEncode(s: SparkSession, d: String): DataFrame = {
    val merges = bpeTrained(s, d)._2.map(m => (m._2, m._3))
    val words = documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val st = bpeApply(
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")), merges)
    words
      .select(col("doc_id"), length(col("w")).as("nc"),
        // spaces-1: state " a b c " carries one space per symbol plus
        // the leading pad; each applied merge removes exactly one space
        (length(st) - length(replace(st, lit(" "), lit(""))) - 1).as("nt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("nc").as("n_chars"),
        sum("nt").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** t34: token-budget sampling in TRAINED units — t12's budget meter
    * with the weight column t33 makes real: documents are kept by the
    * same content-keyed md5 coin, but the budget is denominated in
    * trained BPE tokens instead of whitespace splits, so the kept
    * set's expected cost matches what a tokenizer-fed training run
    * actually pays (whitespace counts under-charge long words and
    * over-charge merge-heavy text). Same scale shape as t12 — the
    * t33 projection + one 1-row total broadcast + a codegen'd coin
    * filter; the coin salt differs from t12's so the two samplers
    * draw independent keeps.
    */
  private val BpeBudgetTokens = 30000L
  def t34BpeBudgetSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.toWeightBudget(
        t33BpeEncode(s, d).select(col("doc_id"), col("n_tokens")),
        col("doc_id"), col("n_tokens"), budget = BpeBudgetTokens,
        salt = "bpe")
      .orderBy("doc_id")

  /** Per-(doc, word-position) TRAINED token counts — t33's encode
    * projection kept at word grain with the original split position,
    * the unit source every trained-denomination packer/chunker
    * composes (r12 verdict #3: t10/t17/t19 counted whitespace splits,
    * so the packed context windows a training run consumes were
    * metered in the wrong unit — long words under-charged, merge-heavy
    * text over-charged, exactly the mismatch t34's budget fix named on
    * the sampling side). Same scale shape as t33: the memoized merge
    * list compiles into a codegen'd literal-replace chain over the
    * word explode — no join, one corpus scan.
    */
  private def encodedWords(s: SparkSession, d: String): DataFrame = {
    val merges = bpeTrained(s, d)._2.map(m => (m._2, m._3))
    val st = bpeApply(
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")), merges)
    documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), col("lang"), col("pos"), col("w"),
        (length(st) - length(replace(st, lit(" "), lit(""))) - 1)
          .cast("long").as("nt"))
  }

  /** The trained-token STREAM, one space-joined string per doc in
    * word order — the relation the production-width substring cut
    * (t44) slides over: BPE symbols contain no spaces, so the
    * space-joined form round-trips exactly and the word-grain span
    * machinery ([[SubstringDedup]]) applies verbatim at token grain.
    * Same scale shape as t33: the memoized merge list compiles into a
    * codegen'd literal-replace chain over the word explode, one
    * corpus scan, one doc_id-keyed agg.
    */
  private[graft] def bpeTokenText(s: SparkSession, d: String): DataFrame =
    bpeTokenTextOf(documents(s, d),
      bpeTrained(s, d)._2.map(m => (m._2, m._3)))

  /** The stream encode against an EXPLICIT merge list — the shared
    * body [[bpeTokenText]] and the frozen-tokenizer append path
    * ([[maintainBpeStream]]) both compile their literal-replace chain
    * from, so the two cannot drift.
    */
  private def bpeTokenTextOf(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val st = bpeApply(
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")), merges)
    docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), col("pos"), trim(st).as("enc"))
      .groupBy("doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(pos, enc))), x -> x.enc), ' ')").as("text"))
  }

  // ---- persisted trained-token STREAM (r16) --------------------------
  // t44's input relation: the whole corpus re-encoded through the
  // merge chain on every run was the round's newest
  // recompute-per-query bill (the encode, not the span logic,
  // dominates — the same shape the band/fingerprint/ngo families
  // escaped). The stream is derived from docs + the trained tokenizer,
  // and the tokenizer is itself a function of docs, so the
  // documents.parquet stamp witnesses BOTH inputs. Bucketed + sorted
  // on doc_id: t44's per-doc windows, the run-hash join, and the
  // token explode's doc-grain aggregate all ride the layout.
  //
  // Maintenance is POLICY-COUPLED to the tokenizer ([[maintainBpe]]):
  // under "always" every delta can move the merges, which re-encodes
  // EVERY doc — the only sound move is a full re-persist (the same
  // corpus-sized bill the "always" tokenizer leg already accepts);
  // under "on-doubling" the tokenizer is FROZEN, encodings are
  // per-doc local, and the increment's rows append exactly (with the
  // re-persist fallback when the doubling retrain fires).

  private val BpeStreamPrefix = "bpets"

  /** Persist the trained-token stream table for tier `d`. */
  def persistBpeStream(s: SparkSession, d: String,
      buckets: Int = 32): String =
    graft.lake.IndexTables.persist(s, bpeTokenText(s, d),
      BpeStreamPrefix, bpePath(d), Seq("doc_id"), buckets)

  /** Drop the stream table for tier `d`, if any. */
  def dropBpeStream(s: SparkSession, d: String): Unit =
    graft.lake.IndexTables.drop(s, BpeStreamPrefix, bpePath(d))

  /** The stream table's stamp — [[maintainBpeStream]]'s prevSig handle. */
  def bpeStreamStamp(s: SparkSession, d: String): Option[String] =
    graft.lake.IndexTables.stampOf(s, BpeStreamPrefix, bpePath(d))

  /** The served stream when fresh — t44's 100 TB default. */
  private[graft] def servedBpeStream(s: SparkSession,
      d: String): Option[DataFrame] =
    graft.lake.IndexTables.serve(s, BpeStreamPrefix, bpePath(d))

  /** The stream relation consumers read: served table else inline. */
  private[graft] def bpeStream(s: SparkSession, d: String): DataFrame =
    servedBpeStream(s, d).getOrElse(bpeTokenText(s, d))

  /** NIGHTLY stream maintenance — run AFTER [[maintainBpe]] (the
    * stream derives from whatever tokenizer that leg left serving):
    * `retrained` is maintainBpe's return — true means the merges
    * moved, every encoding is suspect, re-persist; false (the frozen
    * on-doubling path) means per-doc locality holds and the admitted
    * docs' rows append exactly, encoded with the SERVED frozen merges
    * (BpeSpec pins append ≡ rebuild under the frozen artifact).
    */
  def maintainBpeStream(s: SparkSession, d: String, admitted: DataFrame,
      prevSig: String, retrained: Boolean): Unit = {
    val stamp = bpeStreamStamp(s, d)
    if (!stamp.contains(prevSig))
      throw new IllegalStateException(
        s"maintainBpeStream($d): table stamp $stamp != expected $prevSig " +
          "— corpus or table changed under the maintainer")
    if (retrained) persistBpeStream(s, d)
    else {
      // post-restamp, bpeTrained serves the FROZEN artifact
      val frozen = bpeTrained(s, d)._2.map(m => (m._2, m._3))
      graft.lake.IndexTables.appendIncrement(s,
        bpeTokenTextOf(admitted, frozen), BpeStreamPrefix, bpePath(d),
        prevSig)
    }
  }

  /** [[bpeEncodePosCtes]]' stream twin for the t44 oracle:
    * `bt(doc_id, text)` — the per-doc space-joined trained-token
    * stream, built from the same replayed merge chain.
    */
  private[text] lazy val bpeTokenTextCtes: String = {
    val applied = (1 to BpeMerges).foldLeft(
      "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')") { (acc, i) =>
      (1 to BpeReplacePasses).foldLeft(acc)((a, _) =>
        s"replace($a, m$i.pat, m$i.rep)")
    }
    val mergeFrom = (1 to BpeMerges).map(i => s"m$i").mkString(", ")
    s"""$bpeChainDuck,
       |dwp AS (
       |  SELECT doc_id, pos, w FROM (
       |    SELECT doc_id,
       |      unnest(range(len(ws))) AS pos,
       |      unnest(list_transform(range(len(ws)), i -> ws[i+1])) AS w
       |    FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
       |          FROM documents))
       |  WHERE w <> ''
       |), bt AS MATERIALIZED (
       |  SELECT doc_id, string_agg(trim(st), ' ' ORDER BY pos) AS text
       |  FROM (SELECT dwp.doc_id, dwp.pos, $applied AS st
       |        FROM dwp, $mergeFrom)
       |  GROUP BY doc_id
       |)""".stripMargin
  }

  /** Per-doc trained token totals with the shard key — the t35/t36
    * input relation (one doc_id-keyed partial-agg shuffle over
    * [[encodedWords]]). Grouped on doc_id ALONE (lang rides as max —
    * functionally dependent, one lang per doc) so the output stays
    * doc_id-partitioned and t36's text join needs no re-exchange of
    * this side.
    */
  private def trainedDocTokens(s: SparkSession, d: String): DataFrame =
    encodedWords(s, d)
      .groupBy("doc_id")
      .agg(max("lang").as("lang"), sum("nt").as("n_tokens"))

  /** t35: t10's sequence packing RE-DENOMINATED in trained BPE tokens —
    * pack_id = (trained tokens accumulated before this doc, per lang
    * shard) div budget, so a context window holds ≈ `budget` of the
    * units the training run actually pays, not whitespace splits. Plan
    * shape is t10's exactly (the shared distributed prefix sum —
    * r13 verdict #1 — over the checkpointed per-doc trained totals,
    * which the BPE encode must produce only once) on top of t33's
    * codegen'd encode projection; the trained counts come from the
    * same memoized merge list as t33/t34, so sampler, packer, and
    * encoder meter the SAME coin.
    */
  private[graft] val TrainedPackBudget = 2048L
  def t35PackDocsTrained(s: SparkSession, d: String): DataFrame =
    packAssignment(trainedDocTokens(s, d).localCheckpoint(),
      TrainedPackBudget)
      .orderBy("doc_id")

  /** t36: t17's materialized pack payloads with t35's trained-unit
    * boundaries — each (shard, pack) concatenates its member docs
    * (doc_id order, `<eos>`-separated) and accounts its size in
    * trained tokens. Same assignment-then-join shape as t17 (the text
    * payload joins on doc_id after the prefix sum and never enters a
    * window); LlmPipelineSpec re-pins the payload boundary contract
    * in trained units.
    */
  def t36PackPayloadsTrained(s: SparkSession, d: String): DataFrame =
    packPayloads(
      packAssignment(trainedDocTokens(s, d).localCheckpoint(),
        TrainedPackBudget),
      documents(s, d))

  /** t37: budget-exact document SPLITTING at trained-token grain — the
    * downstream splitter t10's docstring promises for over-budget
    * docs, re-denominated: a doc's words are assigned to consecutive
    * chunks by cumulative trained-token count (chunk_id = trained
    * tokens before this word div budget), word-aligned, so every chunk
    * fits a `TrainedChunkTokens`-unit context up to one word of
    * spill — the boundary a token-limited embedder or trainer actually
    * enforces. Distinct from t19, which stays the OVERLAPPING
    * whitespace window (the RAG retrieval convention); this is the
    * partitioning form whose unit had to become trained tokens.
    * Plan: one doc_id-keyed exchange serves the running sum AND the
    * chunk agg (subset clustering), over the codegen'd encode
    * projection — high-cardinality window grain (doc_id), never a
    * global sort.
    */
  private[graft] val TrainedChunkTokens = 160L
  def t37ChunkDocsTrained(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    encodedWords(s, d)
      .withColumn("tok_before", coalesce(sum("nt").over(w), lit(0L)))
      .withColumn("chunk_id",
        expr(s"tok_before div ${TrainedChunkTokens}L"))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).cast("int").as("n_chunk_words"),
        sum("nt").as("n_chunk_tokens"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, w)))," +
          " x -> x.w), ' ')").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t35_pack_docs_trained" -> (t35PackDocsTrained _),
    "t36_pack_payloads_trained" -> (t36PackPayloadsTrained _),
    "t37_chunk_docs_trained" -> (t37ChunkDocsTrained _),
    "t34_bpe_budget_sample" -> (t34BpeBudgetSample _),
    "t33_bpe_encode"   -> (t33BpeEncode _),
    "t32_bigram_lm"    -> (t32BigramLm _),
    "t39_lm_heldout"   -> (t39LmHeldout _),
    "t30_bpe_train"    -> (t30BpeTrain _),
    "t31_bpe_vocab"    -> (t31BpeVocab _),
    "t28_bpe_pairs"    -> (t28BpePairs _),
    "t1_lang_profile"  -> (t1LangProfile _),
    "t2_token_stats"   -> (t2TokenStats _),
    "t3_top_ngrams"    -> (t3TopNgrams _),
    "t4_quality_score" -> (t4QualityScore _),
    "t5_lang_id"       -> (t5LangId _),
    "t6_fingerprint"   -> (t6Fingerprint _),
    "t7_regex_tokens"  -> (t7RegexTokens _),
    "t8_frequent_tokens" -> (t8FrequentTokens _),
    "t9_stratified_sample" -> (t9StratifiedSample _),
    "t16_temperature_mix" -> (t16TemperatureMix _),
    "t17_pack_payloads" -> ((s, d) => t17PackPayloads(s, d)),
    "t10_pack_docs" -> ((s: SparkSession, d: String) => t10PackDocs(s, d)),
    "t11_tfidf_top" -> (t11TfidfTop _),
    "t12_token_budget_sample" -> (t12TokenBudgetSample _),
    "t13_repetition" -> (t13Repetition _),
    "t19_chunk_docs" -> ((s: SparkSession, d: String) => t19ChunkDocs(s, d)),
    "t20_source_filter" -> ((s: SparkSession, d: String) => t20SourceFilter(s, d)),
    "t21_token_rarity" -> (t21TokenRarity _),
    "t22_domain_cap" -> (t22DomainCap _),
    // t23 is intentionally unassigned: the id was skipped when the
    // event-analytics family claimed t24–t26 (EventAnalytics.scala);
    // kept vacant rather than renumbering published oracle history.
  )

  /** t22: domain balancing — cap the corpus at 20 docs per source,
    * chosen by content-keyed hash order (see `Sampling.capPerKey`): the
    * standard guard against heavy-tailed crawl domains swamping the
    * training mix. Deterministic: the md5 order makes the survivor set
    * identical across runs, partitionings, and engines.
    */
  def t22DomainCap(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.capPerKey(
        documents(s, d).select("doc_id", "source"),
        col("source"), col("doc_id"), cap = 20)
      .orderBy("source", "doc_id")

  /** The shared BPE CTE chain: w0 (spaced word-frequency contraction)
    * plus one (p_i, m_i, w_i) triple per merge round — pair counts,
    * 1-row argmax, pass-limited literal replace — the exact loop the
    * Spark side runs. MATERIALIZED is load-bearing (the g6 lesson):
    * each w_i is referenced by both p_{i+1} and w_{i+1}.
    */
  private val bpeChainDuck: String = {
    val rounds = (1 to BpeMerges).map { i =>
      val reps = (1 to BpeReplacePasses)
        .foldLeft("state")((acc, _) => s"replace($acc, m.pat, m.rep)")
      s"""p$i AS MATERIALIZED (
         |  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(len(syms)-1),
         |      j -> syms[j+1] || ' ' || syms[j+2])) AS pair, n
         |    FROM (SELECT string_split(trim(state), ' ') AS syms, n
         |          FROM w${i - 1}))
         |  GROUP BY pair
         |), m$i AS MATERIALIZED (
         |  SELECT pair, replace(pair, ' ', '') AS merged, cnt,
         |    ' ' || pair || ' ' AS pat,
         |    ' ' || replace(pair, ' ', '') || ' ' AS rep
         |  FROM p$i ORDER BY cnt DESC, pair LIMIT 1
         |), w$i AS MATERIALIZED (
         |  SELECT $reps AS state, n FROM w${i - 1}, m$i m
         |)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS state,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
       |        FROM documents)
       |  WHERE length(w) >= 2 GROUP BY 1
       |),
       |$rounds""".stripMargin
  }

  /** The trained-encoding CTE chain: [[bpeChainDuck]] (whose m1..m10
    * are 1-row merge CTEs) + per-word application of the same
    * pass-limited replaces the Spark side compiles from the
    * driver-resident merge list, aggregated to
    * `encagg(doc_id, n_words, n_chars, n_tokens)` — shared by the t33
    * and t34 oracles.
    */
  private lazy val bpeEncodeCtes: String = {
    val applied = (1 to BpeMerges).foldLeft(
      "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')") { (acc, i) =>
      (1 to BpeReplacePasses).foldLeft(acc)((a, _) =>
        s"replace($a, m$i.pat, m$i.rep)")
    }
    val mergeFrom = (1 to BpeMerges).map(i => s"m$i").mkString(", ")
    s"""$bpeChainDuck,
       |dw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents)
       |  WHERE w <> ''
       |), enc AS (
       |  SELECT doc_id, length(w) AS nc,
       |    length(st) - length(replace(st, ' ', '')) - 1 AS nt
       |  FROM (SELECT dw.doc_id, dw.w, $applied AS st
       |        FROM dw, $mergeFrom)
       |), encagg AS MATERIALIZED (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(nc) AS BIGINT) AS n_chars,
       |    CAST(sum(nt) AS BIGINT) AS n_tokens
       |  FROM enc GROUP BY doc_id
       |)""".stripMargin
  }

  /** Positional variant of [[bpeEncodeCtes]]: per-(doc, split-position)
    * trained token counts `encp(doc_id, pos, w, nt)` — the oracle twin
    * of [[encodedWords]] (parallel unnest zips positionally in DuckDB,
    * the t32 pattern; empties are filtered but keep their original
    * positions, exactly like the Spark posexplode+filter). Shared by
    * the t37 oracle.
    */
  private lazy val bpeEncodePosCtes: String = {
    val applied = (1 to BpeMerges).foldLeft(
      "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')") { (acc, i) =>
      (1 to BpeReplacePasses).foldLeft(acc)((a, _) =>
        s"replace($a, m$i.pat, m$i.rep)")
    }
    val mergeFrom = (1 to BpeMerges).map(i => s"m$i").mkString(", ")
    s"""$bpeChainDuck,
       |dwp AS (
       |  SELECT doc_id, pos, w FROM (
       |    SELECT doc_id,
       |      unnest(range(len(ws))) AS pos,
       |      unnest(list_transform(range(len(ws)), i -> ws[i+1])) AS w
       |    FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
       |          FROM documents))
       |  WHERE w <> ''
       |), encp AS MATERIALIZED (
       |  SELECT doc_id, pos, w,
       |    length(st) - length(replace(st, ' ', '')) - 1 AS nt
       |  FROM (SELECT dwp.doc_id, dwp.pos, dwp.w, $applied AS st
       |        FROM dwp, $mergeFrom)
       |)""".stripMargin
  }

  /** The t35/t36 shard-windowed pack assignment over `encagg` + the
    * documents join — shared CTE suffix of the two trained-packing
    * oracles.
    */
  private lazy val trainedPackCtes: String =
    s"""pd AS (
       |  SELECT e.doc_id, d.lang, d.text, e.n_tokens
       |  FROM encagg e JOIN documents d USING (doc_id)
       |), pk AS (
       |  SELECT doc_id, lang, text, n_tokens,
       |    COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS tok_before
       |  FROM pd
       |)""".stripMargin

  def oracles: Map[String, String] = Map(
    // parallel unnest of equal-length lists zips positionally in DuckDB
    // (verified) — the two list_transforms share one range generator
    "t39_lm_heldout" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(len(tk)-1), i -> tk[i+1])) AS w1,
        |    unnest(list_transform(range(len(tk)-1), i -> tk[i+2])) AS w2
        |  FROM t WHERE len(tk) >= 2
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
        |), model AS (
        |  SELECT c12.w1, c12.w2, c12.c12 * 1000000 // c1.c1 AS p_ppm
        |  FROM c12 JOIN c1 USING (w1)
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(COALESCE(p_ppm, 1)) // count(*) AS BIGINT) AS avg_p_ppm
        |FROM (SELECT * FROM bg WHERE doc_id % 2 = 1) sb
        |LEFT JOIN model USING (w1, w2)
        |GROUP BY doc_id
        |ORDER BY avg_p_ppm ASC, doc_id ASC LIMIT 20""".stripMargin,
    "t32_bigram_lm" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(len(tk)-1), i -> tk[i+1])) AS w1,
        |    unnest(list_transform(range(len(tk)-1), i -> tk[i+2])) AS w2
        |  FROM t WHERE len(tk) >= 2
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
        |), model AS (
        |  SELECT c12.w1, c12.w2, c12.c12 * 1000000 // c1.c1 AS p_ppm
        |  FROM c12 JOIN c1 USING (w1)
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS avg_p_ppm
        |FROM bg JOIN model USING (w1, w2)
        |GROUP BY doc_id
        |ORDER BY avg_p_ppm ASC, doc_id ASC LIMIT 20""".stripMargin,
    "t33_bpe_encode" ->
      s"""WITH $bpeEncodeCtes
         |SELECT doc_id, n_words, n_chars, n_tokens FROM encagg
         |ORDER BY doc_id""".stripMargin,
    "t35_pack_docs_trained" ->
      s"""WITH $bpeEncodeCtes,
         |$trainedPackCtes
         |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(tok_before // $TrainedPackBudget AS BIGINT) AS pack_id
         |FROM pk ORDER BY doc_id""".stripMargin,
    "t36_pack_payloads_trained" ->
      s"""WITH $bpeEncodeCtes,
         |$trainedPackCtes
         |SELECT lang, CAST(tok_before // $TrainedPackBudget AS BIGINT)
         |    AS pack_id,
         |  CAST(count(*) AS INTEGER) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  string_agg(text, ' <eos> ' ORDER BY doc_id) AS payload
         |FROM pk GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin,
    "t37_chunk_docs_trained" ->
      s"""WITH $bpeEncodePosCtes,
         |ck AS (
         |  SELECT doc_id, pos, w, nt,
         |    COALESCE(sum(nt) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS tok_before
         |  FROM encp
         |)
         |SELECT doc_id,
         |  CAST(tok_before // $TrainedChunkTokens AS BIGINT) AS chunk_id,
         |  CAST(count(*) AS INTEGER) AS n_chunk_words,
         |  CAST(sum(nt) AS BIGINT) AS n_chunk_tokens,
         |  string_agg(w, ' ' ORDER BY pos) AS chunk
         |FROM ck GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin,
    "t34_bpe_budget_sample" ->
      s"""WITH $bpeEncodeCtes,
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM encagg)
         |SELECT doc_id, n_tokens FROM encagg
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'bpe'),
         |        1, 8) AS BIGINT) % 1000000
         |      < ($BpeBudgetTokens::BIGINT * 1000000)
         |        // (SELECT total FROM tot)
         |ORDER BY doc_id""".stripMargin,
    "t30_bpe_train" -> {
      val sel = (1 to BpeMerges)
        .map(i => s"SELECT CAST($i AS INTEGER) AS rank, pair, merged, cnt FROM m$i")
        .mkString("\n  UNION ALL ")
      s"""WITH $bpeChainDuck
         |SELECT rank, pair, merged, cnt FROM (
         |  $sel)
         |ORDER BY rank""".stripMargin
    },
    "t31_bpe_vocab" ->
      s"""WITH $bpeChainDuck
         |SELECT sym, CAST(sum(n) AS BIGINT) AS freq FROM (
         |  SELECT unnest(string_split(trim(state), ' ')) AS sym, n
         |  FROM w$BpeMerges)
         |GROUP BY sym ORDER BY freq DESC, sym LIMIT 20""".stripMargin,
    "t28_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents),
        |p AS (
        |  SELECT w, unnest(range(1, length(w))) AS i
        |  FROM w WHERE length(w) >= 2),
        |b AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair FROM p)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY 1
        |ORDER BY n DESC, pair LIMIT 30""".stripMargin,
    "t13_repetition" ->
      """SELECT doc_id,
        |  CAST(len(t)-2 AS INTEGER) AS n_grams,
        |  CAST(len(list_distinct(list_transform(range(len(t)-2),
        |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS INTEGER) AS n_distinct,
        |  CAST(floor(CAST((len(t)-2) - len(list_distinct(list_transform(range(len(t)-2),
        |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS DOUBLE) * 10000.0
        |    / (len(t)-2)) AS BIGINT) AS rep_bp
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |WHERE len(t) >= 3 ORDER BY doc_id""".stripMargin,
    "t12_token_budget_sample" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |tot AS (SELECT sum(n_tokens) AS total FROM t)
        |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens FROM t
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'tb'), 1, 8)
        |        AS BIGINT) % 1000000
        |      < (20000::BIGINT * 1000000) // (SELECT total FROM tot)
        |ORDER BY doc_id""".stripMargin,
    "t11_tfidf_top" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  score, CAST(rn AS INTEGER) AS rn
        |FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) * (SELECT n FROM n) / df.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf AS DOUBLE) * (SELECT n FROM n) / df.df DESC,
        |               tf.term) AS rn
        |  FROM tf JOIN df USING (term))
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "t8_frequent_tokens" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM tok GROUP BY token
        |HAVING count(*) >= (SELECT (n + 499) // 500 FROM tot)
        |ORDER BY cnt DESC, token""".stripMargin,
    "t9_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8)
        |        AS BIGINT) % 1000000
        |      < CASE WHEN lang = 'en' THEN 250000 ELSE 800000 END
        |ORDER BY doc_id""".stripMargin,
    "t17_pack_payloads" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    COALESCE(sum(len(string_split(text, ' '))) OVER (
        |      PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tok_before
        |  FROM documents)
        |SELECT lang, pack_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
        |  string_agg(text, ' <eos> ' ORDER BY doc_id) AS payload
        |FROM (SELECT doc_id, lang, text, n_tokens,
        |        CAST(tok_before // 2048 AS BIGINT) AS pack_id FROM t)
        |GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin,
    "t16_temperature_mix" ->
      """WITH s AS (
        |  SELECT lang AS g, COUNT(*) AS n,
        |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))
        |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS wfx
        |  FROM documents GROUP BY lang
        |), w AS (SELECT CAST(SUM(wfx) AS BIGINT) AS tw FROM s),
        |t AS (
        |  SELECT g, LEAST(1000000,
        |    CAST(FLOOR(CAST(wfx AS DOUBLE) * CAST(250 AS DOUBLE)
        |      * CAST(1000000 AS DOUBLE)
        |      / (CAST(tw AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)) AS thr
        |  FROM s, w)
        |SELECT d.doc_id, d.lang FROM documents d JOIN t ON d.lang = t.g
        |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 8)
        |        AS BIGINT) % 1000000 < t.thr
        |ORDER BY doc_id""".stripMargin,
    "t10_pack_docs" ->
      """SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
        |    AS BIGINT) AS pack_id
        |FROM (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t1_lang_profile" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "t2_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(t) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS INTEGER) AS n_uniq,
        |  CAST(floor(CAST(len(list_distinct(t)) AS DOUBLE) * 10000.0 / len(t))
        |    AS BIGINT) AS ttr_bp
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t22_domain_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY source, doc_id""".stripMargin,
    "t3_top_ngrams" ->
      """SELECT ngram, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(list_transform(range(len(t)-1),
        |    i -> t[i+1] || ' ' || t[i+2])) AS ngram
        |  FROM (SELECT string_split(text, ' ') AS t FROM documents))
        |GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin,
    "t21_token_rarity" ->
      """WITH ts AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), tot AS (SELECT COUNT(*) AS n_total FROM ts),
        |v AS (
        |  SELECT tok,
        |    COUNT(*) * 1000000 // (SELECT n_total FROM tot) AS freq_ppm
        |  FROM ts GROUP BY tok)
        |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_tokens,
        |  CAST(SUM(freq_ppm) // COUNT(*) AS BIGINT) AS mean_freq_ppm,
        |  CAST(MIN(freq_ppm) AS BIGINT) AS rarest_ppm
        |FROM ts JOIN v USING (tok) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "t19_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks, n,
        |    unnest(range(0, 1 + CASE WHEN n > 40
        |      THEN (n - 40 + 29) // 30 ELSE 0 END)) AS chunk_id
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |  CAST(LEAST(40, n - chunk_id * 30) AS INTEGER) AS n_chunk_tokens,
        |  array_to_string(toks[chunk_id * 30 + 1 : chunk_id * 30 + 40], ' ')
        |    AS chunk
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "t20_source_filter" ->
      """WITH q AS (
        |  SELECT source,
        |    CAST(floor((least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.5 +
        |      (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |        x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS DOUBLE)
        |        / len(string_split(text, ' '))) * 0.5) * 10000.0)
        |      AS BIGINT) AS q_bp
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS INTEGER) AS n_docs,
        |  CAST(SUM(q_bp) // COUNT(*) AS BIGINT) AS mean_q_bp,
        |  SUM(q_bp) // COUNT(*) >= 7450 AS kept
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "t4_quality_score" ->
      """SELECT doc_id, CAST(stop_hits AS INTEGER) AS stop_hits,
        |  CAST(floor((least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.5 +
        |    (1.0 - CAST(stop_hits AS DOUBLE) / len(t)) * 0.5) * 10000.0)
        |    AS BIGINT) AS quality_bp
        |FROM (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS t,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS stop_hits
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t5_lang_id" ->
      """SELECT doc_id, lang,
        |  CASE
        |    WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
        |    WHEN hits_de >= hits_es AND hits_de > 0 THEN 'de'
        |    WHEN hits_es > 0 THEN 'es'
        |    ELSE 'und' END AS lang_pred
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'and', 'of'))) AS hits_en,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('der', 'die', 'das', 'und'))) AS hits_de,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('el', 'la', 'los', 'y'))) AS hits_es
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t7_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
        |    AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t6_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(text, ' '),
         |        x -> ${Hashing.h32Duck("x")} % 1000000007)),
         |    (acc, h) -> (acc * 31 + h) % 1000000007) AS fp_rolling,
         |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         |    AS fp_canonical
         |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
