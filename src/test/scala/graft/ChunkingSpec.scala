package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.Tables
import graft.text.TextAnalysis

/** t19 chunking and t20 domain filtering: coverage/overlap invariants
  * and the scorecard↔filter consistency.
  */
class ChunkingSpec extends AnyFunSuite {
  import TestSpark._

  test("chunking covers every token; stride overlap is exact; short docs get one chunk") {
    val docs = Tables.documents(spark, sf)
      .withColumn("n", size(split(col("text"), " ")))
    val chunks = TextAnalysis.t19ChunkDocs(spark, sf)
    // per doc: first chunk starts at token 1, last chunk reaches token n
    val agg = chunks.groupBy("doc_id").agg(
      max("chunk_id").as("last"),
      sum("n_chunk_tokens").as("sum_tok"),
      count(lit(1)).as("n_chunks"))
      .join(docs.select("doc_id", "n"), "doc_id")
    // last chunk's end = min(last*30 + 40, ...) must reach n exactly:
    // last*30 + n_chunk_tokens(last) == n  <=>  sum over chunks of
    // (tokens - overlap contributions) — check directly per chunk
    val bad = chunks
      .join(docs.select("doc_id", "n"), "doc_id")
      .withColumn("end", col("chunk_id") * 30 + col("n_chunk_tokens"))
      .groupBy("doc_id", "n").agg(max("end").as("maxEnd"))
      .filter(col("maxEnd") =!= col("n")).count()
    assert(bad == 0, "some doc's chunks do not cover its token tail")
    // short docs (n <= 40): exactly one chunk of n tokens
    val shortBad = agg.filter(col("n") <= 40)
      .filter(col("n_chunks") =!= 1 || col("sum_tok") =!= col("n")).count()
    assert(shortBad == 0)
    // long docs: every non-first chunk overlaps the previous by 10
    // (size 40 - stride 30), i.e. sum_tok = n + 10*(n_chunks-1)
    val overlapBad = agg.filter(col("n") > 40)
      .filter(col("sum_tok") =!=
        col("n") + lit(10) * (col("n_chunks") - 1)).count()
    assert(overlapBad == 0, "overlap accounting off for some long doc")
  }

  test("trained-unit packing/chunking: one coin with t33; pack and chunk boundaries hold in trained tokens (r12 verdict #3)") {
    import org.apache.spark.sql.functions._
    val budget = TextAnalysis.TrainedPackBudget
    val chunkB = TextAnalysis.TrainedChunkTokens

    // (a) the packer meters the SAME coin as the encoder/sampler:
    // t35's per-doc n_tokens equals t33's, row for row
    val enc = TextAnalysis.t33BpeEncode(spark, sf)
      .select("doc_id", "n_tokens")
    val packed = TextAnalysis.t35PackDocsTrained(spark, sf)
    assert(packed.select("doc_id", "n_tokens").except(enc).isEmpty,
      "t35 counts a different token coin than t33")

    // (b) t10's greedy boundary contract, re-pinned in trained units:
    // within a shard, pack_id = floor(cumulative trained tokens /
    // budget) — so every pack's START sits in its budget window, and a
    // pack overflows the budget by at most its last member
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val bad = packed
      .withColumn("tok_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("pack_id") =!= expr(s"tok_before div ${budget}L"))
      .count()
    assert(bad == 0, "some doc's trained pack_id breaks the greedy formula")

    // (c) payloads agree with the assignment: per (lang, pack) the
    // payload row's accounting equals the packer's group
    val fromT35 = packed.groupBy("lang", "pack_id")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum("n_tokens").as("pack_tokens"))
    val fromT36 = TextAnalysis.t36PackPayloadsTrained(spark, sf)
      .select("lang", "pack_id", "n_docs", "pack_tokens")
    assert(fromT36.except(fromT35).isEmpty && fromT35.except(fromT36).isEmpty,
      "t36 payload accounting diverged from t35's assignment")
    // ...and a pack's payload carries exactly n_docs <eos>-separated docs
    val eosBad = TextAnalysis.t36PackPayloadsTrained(spark, sf)
      .filter(size(split(col("payload"), " <eos> ", -1)) =!= col("n_docs"))
      .count()
    assert(eosBad == 0, "payload <eos> structure disagrees with n_docs")

    // (d) chunk splitting covers each doc exactly and fits the budget
    // up to one word of spill (word-aligned boundaries)
    val chunks = TextAnalysis.t37ChunkDocsTrained(spark, sf)
    val cover = chunks.groupBy("doc_id")
      .agg(sum("n_chunk_tokens").as("sum_tok"))
      .join(enc, "doc_id")
      .filter(col("sum_tok") =!= col("n_tokens")).count()
    assert(cover == 0, "chunks do not cover their doc's trained tokens")
    // every chunk start sits inside its budget window, so a chunk can
    // exceed the budget only by its LAST word's cost: n_chunk_tokens <
    // B + max word nt in the chunk, and word nt <= its char length
    // (each merge only shrinks), so the longest word bounds the spill
    val spillBad = chunks
      .withColumn("max_word_len",
        expr("array_max(transform(split(chunk, ' '), x -> length(x)))"))
      .filter(col("n_chunk_tokens") >= lit(chunkB) + col("max_word_len"))
      .count()
    assert(spillBad == 0, "a chunk exceeds budget beyond one-word spill")
  }

  test("domain filter keeps exactly the docs of kept sources") {
    val card = TextAnalysis.t20SourceFilter(spark, sf)
    val keptSources = card.filter(col("kept")).select("source")
      .collect().map(_.getString(0)).toSet
    val kept = TextAnalysis.filterSources(spark, sf)
    assert(kept.select("source").distinct()
      .collect().map(_.getString(0)).toSet == keptSources)
    val expected = Tables.documents(spark, sf)
      .filter(col("source").isin(keptSources.toSeq: _*)).count()
    assert(kept.count() == expected)
  }
}
