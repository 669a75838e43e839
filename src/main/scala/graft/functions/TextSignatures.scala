package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row dedup-signature kernels: the whole MinHash / SimHash
  * signature of a document computed inside ONE narrow projection.
  *
  * Why this beats the explode + hash-aggregate forms in
  * [[graft.text.Dedup]] (kept there as the `*Agg` variants for the
  * equivalence tests):
  *
  *   - SimHash's aggregate form shuffles the DISTINCT-TOKEN stream — a
  *     `groupBy(doc_id, tok)` exchange whose row count is the corpus
  *     token vocabulary × docs. Per-row computation deletes that
  *     exchange: the signature stage becomes scan → project, and the
  *     first shuffle in the whole dedup pipeline is the (tiny) band-key
  *     join. At 100 TB that is the difference between shuffling ~the
  *     corpus and shuffling one 8-byte signature per document.
  *   - MinHash's aggregate form keeps its exchange small via map-side
  *     partial `min()`s, but still pays one exploded row + one
  *     hash-aggregate probe per shingle. The kernel updates 16 running
  *     minima in registers.
  *
  * Both kernels live as static JVM methods called from `doGenCode` —
  * the generated call stays inside whole-stage codegen (no
  * CodegenFallback materialization of rows), while the loop body itself
  * is JIT-compiled Scala, free of janino's 64 KB method limit that a
  * fully inlined 16-seed × shingle loop would risk.
  *
  * Hash arithmetic is bit-identical to the SQL fragments in
  * [[Hashing]] (md5-derived h32/h60 for the DuckDB-oracle gate;
  * xxhash64-derived for the production family — same seed-42 digest as
  * Spark's `xxhash64` built-in, asserted in LlmPipelineSpec), so the
  * native and aggregate forms produce EQUAL signatures, not merely
  * equally-good ones.
  */
object TextKernels {

  /** Tokens exactly as Spark's `split(text, " ")`: Java regex, limit -1
    * (trailing empty strings preserved).
    */
  private def tokens(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  // MessageDigest instances are stateful: one per TASK THREAD (not per
  // call — getInstance is a JCA provider lookup + allocation, and the
  // kernel hashes every shingle/token) keeps the kernel thread-safe
  // under codegen'd multi-threaded execution at zero per-hash cost.
  private val md5Digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def md5(s: String): Array[Byte] = {
    val md = md5Digest.get()
    md.reset()
    md.digest(s.getBytes("UTF-8"))
  }

  /** First 8 hex chars of md5 as a long — [[Hashing.h32Sql]]. */
  private def md5H32(s: String): Long = {
    val d = md5(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 15 hex chars of md5 as a long — [[Hashing.h60Sql]]. */
  private def md5H60(s: String): Long = {
    val d = md5(s)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Spark's `xxhash64(s)` (seed 42 over the UTF-8 bytes). */
  private def xx64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  private def h32(s: String, xx: Boolean): Long =
    if (xx) xx64(s) & 0xffffffffL else md5H32(s)

  private def h60(s: String, xx: Boolean): Long =
    if (xx) xx64(s) & 0xfffffffffffffffL else md5H60(s)

  /** 60-bit TF-weighted simhash of `text`; bit b is set iff
    * 2·S_b − C > 0 with S_b = Σ count(tok)[bit b of h60(tok) set] over
    * DISTINCT tokens, C = Σ count — the exact arithmetic of the
    * aggregate form in Dedup.d3Simhash.
    */
  def simhash60(text: UTF8String, xx: Boolean): Long = {
    val counts = new java.util.HashMap[String, Long]()
    tokens(text).foreach { t =>
      counts.merge(t, 1L, (a, b) => a + b)
    }
    val s = new Array[Long](60)
    var c = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = h60(e.getKey, xx)
      val cnt = e.getValue
      c += cnt
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) s(b) += cnt
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2 * s(b) - c > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 16 minhash values over the 3-gram shingle multiset of `text`
    * (min over the multiset equals min over the distinct set), using
    * the universal family h_k(x) = ((2k+1)·x + 7919k) mod 4294967311 —
    * the exact arithmetic of Dedup.minhashSigsAgg. Returns null-free
    * array<bigint>; caller must pre-filter docs to ≥ 3 tokens (no
    * shingles otherwise — mirrored by the aggregate form, where such
    * docs simply produce no rows).
    */
  def minhash16(text: UTF8String, xx: Boolean): ArrayData = {
    val toks = tokens(text)
    val mins = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i + 2 < toks.length) {
      val h = h32(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), xx)
      var k = 0
      while (k < 16) {
        val v = ((2 * k + 1) * h + 7919L * k) % 4294967311L
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** md5 digest of every word-n-gram (space-joined), one 16-byte value
    * per start position — bit-identical to the SQL chain
    * `transform(sequence(0, size(t)-n), i -> md5(concat_ws(' ',
    * slice(t, i+1, n))))` over `t = split(text, ' ')`, but computed in
    * one JVM loop over cached token bytes: no per-row Catalyst array
    * materialization, no per-ngram string concat + re-encode (the
    * UTF-8 bytes of a space-joined ngram are the token byte runs with
    * 0x20 between them, streamed straight into the digest). The SQL
    * form is an array-HOF chain — CodegenFallback in Spark — and this
    * kernel replaces it in the `ngo` index builder, the repo's
    * largest derived relation (one row per corpus token). Docs
    * shorter than n yield an empty array (posexplode then emits no
    * occurrence rows, matching the SQL path's size filter).
    */
  def ngramMd5(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) { tb(i) = toks(i).getBytes("UTF-8"); i += 1 }
    val md = md5Digest.get()
    val out = new Array[Any](m)
    val space = Array[Byte](0x20)
    i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(space)
        md.update(tb(i + j))
        j += 1
      }
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_simhash(text[, use_xx])` — see [[TextKernels.simhash60]]. */
case class SimHashSig(child: Expression, xx: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash60(input.asInstanceOf[UTF8String], xx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.simhash60($c, $xx)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** `graft_minhash(text[, use_xx])` — see [[TextKernels.minhash16]]. */
case class MinHashSig(child: Expression, xx: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhash16(input.asInstanceOf[UTF8String], xx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.minhash16($c, $xx)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_ngram_md5(text, n)` — see [[TextKernels.ngramMd5]]. */
case class NgramMd5(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_md5 expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.ngramMd5(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.ngramMd5($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramMd5 =
    copy(child = newChild)
}

object TextSignatures {
  /** Builder shared by GraftExtensions and ensureRegistered: optional
    * second arg is a foldable boolean picking the xxhash64 family.
    */
  private def build(name: String,
      mk: (Expression, Boolean) => Expression)(exprs: Seq[Expression]): Expression = {
    require(exprs.nonEmpty && exprs.length <= 2,
      s"$name takes 1 or 2 arguments")
    val xx = exprs.lift(1).map { e =>
      require(e.foldable && e.dataType == BooleanType,
        s"$name's second argument must be a boolean literal")
      e.eval().asInstanceOf[Boolean]
    }.getOrElse(false)
    mk(exprs.head, xx)
  }

  val makeSimhash: Seq[Expression] => Expression =
    build("graft_simhash", SimHashSig.apply)
  val makeMinhash: Seq[Expression] => Expression =
    build("graft_minhash", MinHashSig.apply)

  val makeNgramMd5: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_ngram_md5 takes (text, n)")
    val n = exprs(1)
    require(n.foldable && n.dataType == IntegerType,
      "graft_ngram_md5's second argument must be an int literal")
    // ADVICE r15: the function is user-callable via SQL, so the width
    // must be validated here — graft_ngram_md5(text, 0) would return
    // len+1 digests of the empty string, silently diverging from the
    // documented SQL-chain equivalence; a NULL literal evaluates to
    // null, which asInstanceOf[Int] would silently unbox to 0.
    val nv = n.eval()
    require(nv != null && nv.asInstanceOf[Int] >= 1,
      "graft_ngram_md5's width must be a non-null int >= 1")
    NgramMd5(exprs.head, nv.asInstanceOf[Int])
  }

  /** Idempotent in-code registration (sessions without the extensions
    * config) — same pattern as [[VectorExpressions.ensureRegistered]].
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", makeSimhash, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", makeMinhash, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_md5", makeNgramMd5, "built-in")
  }
}
