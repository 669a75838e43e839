package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 verdict #7: PRICE t44's conservative residue. cutSpansMaximal
  * keeps content-unique maximal runs whole (the containment case —
  * the run's full span exists nowhere else even though interior
  * slices do), where a per-gram election at the SAME grain and width
  * would cut the duplicated slices. The trade was argued in the
  * docstring; this diagnostic measures it: positional cut-token sets
  * of the two elections over the SAME trained-BPE token stream at
  * width WBpe=50, per tier.
  *
  *   pergram_only = tokens the per-gram cut removes but the maximal
  *                  cut keeps — the KEPT RESIDUE being priced (plus
  *                  mosaic cuts of canonical copies, the failure mode
  *                  run-grain election exists to prevent);
  *   maximal_only = tokens the maximal cut removes but per-gram keeps
  *                  — whole-run atomicity cutting interior grams the
  *                  per-gram election elected as canonical.
  *
  * Usage: runMain graft.tools.T44Residue <tier1> [tier2 ...]
  * Emits one JSON line; commit as T44_RESIDUE_R{N}.json.
  */
object T44Residue {
  def main(args: Array[String]): Unit = {
    val tiers = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{SubstringDedup, TextAnalysis}
    val w = SubstringDedup.WBpe

    val rows = tiers.map { tier =>
      val toks = TextAnalysis.bpeStream(spark, tier).localCheckpoint()
      val total = toks.select(sum(size(split(col("text"), " "))))
        .head().getLong(0)
      val allPos = toks
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").as("p")).localCheckpoint()
      def cutSet(kept: DataFrame): DataFrame = allPos
        .join(kept.select("doc_id", "p"), Seq("doc_id", "p"), "left_anti")
        .localCheckpoint()
      val perGram = cutSet(SubstringDedup.keptTokensPerGram(
        toks, SubstringDedup.occurrencesOfText(toks, w), w))
      val maximal = cutSet(SubstringDedup.keptTokensMaximal(toks, w))
      val nPg = perGram.count()
      val nMx = maximal.count()
      val pgOnly = perGram.join(maximal, Seq("doc_id", "p"), "left_anti").count()
      val mxOnly = maximal.join(perGram, Seq("doc_id", "p"), "left_anti").count()
      val name = tier.replaceAll(".*/", "")
      f""""$name": {"total_tokens": $total, "pergram_cut_tokens": $nPg, "maximal_cut_tokens": $nMx, "pergram_only_tokens": $pgOnly, "maximal_only_tokens": $mxOnly, "kept_residue_ratio_of_pergram": ${pgOnly.toDouble / math.max(nPg, 1)}%.4f, "residue_share_of_corpus": ${pgOnly.toDouble / total}%.6f}"""
    }
    println(s"""{"metric":"t44_residue_vs_pergram","width_bpe":$w,"tiers":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
