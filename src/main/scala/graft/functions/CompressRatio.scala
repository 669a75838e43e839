package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_compress_bp(text)` — DEFLATE compression ratio of a document
  * in basis points: `floor(compressed_bytes * 10000 / raw_utf8_bytes)`.
  *
  * Why an engine needs it: compressibility is one of the strongest
  * cheap quality signals in web-corpus curation — boilerplate, spam,
  * and template farms compress far below organic prose, and
  * RefinedWeb/Dolma-class pipelines cut on exactly this ratio next to
  * the token heuristics in [[graft.text.TextAnalysis]] (reference
  * analogue: the cleaning stages of ETL_glue_pregao_B3.json — this is
  * the signal that pipeline would need first at web scale). n-gram
  * repetition (t13) sees LOCAL duplication; DEFLATE's 32 KB window +
  * Huffman stage also catches long-range and character-level
  * redundancy the shingle statistics miss.
  *
  * Scale shape: a per-row kernel inside ONE codegen'd projection — the
  * scan stays the only pass, nothing shuffles. The Deflater is
  * task-thread-local (native zlib allocation per call would dominate
  * the hot loop); each call `reset()`s it. ~µs per KB — scan-bound next
  * to parquet decode. Lifecycle caveat: the ThreadLocal Deflater holds
  * native zlib state that is never `end()`d — fine under Spark's
  * long-lived pooled task threads (the intended host), but a
  * thread-churning embedder (e.g. a fresh thread per tiny local
  * session) would leak native memory until the threads die.
  *
  * Determinism: zlib level 6, default strategy, fixed dictionary-less
  * stream. For a FIXED zlib build the byte stream is a pure function
  * of the input — stable across runs, partitionings, and retries
  * (asserted in sbt). It is NOT pinned across different zlib builds
  * (the JDK bundles its own, so JVM-upgrade drift is the one caveat —
  * re-derive, don't cache across upgrades). No DuckDB oracle: SQL has
  * no DEFLATE; the spec pins exact values on fixed inputs instead.
  *
  * Null → null; empty string → 10000 bp by convention (a 0-byte input
  * has no meaningful ratio; 10000 = "incompressible" keeps the
  * downstream `ratio_bp < cut` filters monotone without a null branch).
  */
object CompressKernel {
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }

  def ratioBp(text: UTF8String): Long = {
    val raw = text.getBytes
    if (raw.length == 0) return 10000L
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    // count output without keeping it: a 4 KB sink buffer reused across
    // deflate() calls — the kernel never allocates O(doc) memory
    val sink = new Array[Byte](4096)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(sink)
    compressed * 10000L / raw.length
  }
}

/** `graft_compress_bp(text)` — see [[CompressKernel.ratioBp]]. */
case class CompressRatioBp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_compress_bp expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    CompressKernel.ratioBp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressKernel.ratioBp($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : CompressRatioBp = copy(child = newChild)
}

object CompressRatio {
  val make: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_compress_bp takes exactly 1 argument")
    CompressRatioBp(exprs.head)
  }

  /** Idempotent in-code registration (sessions without the extensions
    * config) — same pattern as [[TextSignatures.ensureRegistered]].
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_compress_bp", make, "built-in")
  }
}
