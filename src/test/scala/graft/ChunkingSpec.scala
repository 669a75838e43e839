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
