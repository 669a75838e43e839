package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Runtime Bloom-filter join pruning (SURVEY §2.10 extension surface;
  * reference analogue: the join in ETL_glue_pregao_B3.json runs a full
  * fact scan into the join regardless of how selective the dim filter
  * is — at 100 TB the rows that cannot match must die at the scan).
  *
  * Two pieces, mirroring Spark's own injected runtime filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) but available
  * EXPLICITLY — for plans the optimizer won't inject into (a scan
  * feeding an iterative fixpoint, a custom operator input, a stream):
  *
  *   - [[BloomAggregator]]: a typed, partial-aggregable `Aggregator`
  *     that folds a `Long` key column into an m-bit Bloom bitset. Each
  *     map task builds a local bitset; merge is bitwise OR — the
  *     shuffle carries one m/8-byte buffer per task, never the keys.
  *   - `graft_bloom_contains(filter, key)` ([[BloomMightContain]]): a
  *     codegen'd probe expression. The built filter travels as a
  *     BINARY literal (driver collect bounded by m/8+1 bytes — a
  *     PARAMETER, the PQ-codebook precedent), so the probe is a
  *     per-row k-hash bit test inside whole-stage codegen, before any
  *     exchange.
  *
  * Guarantee: NO false negatives — an inserted key always probes true
  * (double hashing is deterministic), so `fact.filter(probe)` followed
  * by the exact join returns EXACTLY the plain join's rows; the bloom
  * only sheds non-matching rows early (false positives are removed by
  * the join itself). That is what makes j8 oracle-checkable against
  * the plain-join SQL.
  *
  * Hashing: double hashing h_i = h1 + i·h2 over xxhash64 seeds 0/1
  * (Kirsch-Mitzenmacher: two hash passes give k independent-enough
  * probes). Bit count m is a power of two so the modulo is a mask.
  *
  * Serialized form (self-describing): byte 0 = k (probe count), bytes
  * 1..m/8 = little-endian bitset words. numBits derives from the
  * length, so probe sites need no out-of-band config.
  *
  * Scale: m sizes on the driver as ~1.44·n·log2(1/fpr) bits for the
  * EXPECTED dim cardinality — 1 M keys at 1% fpr ≈ 1.2 MB, broadcast
  * cost noise next to the fact scan it prunes. For dim sides too big
  * to collect, Spark's own injected shuffle-side filter is the right
  * tool; this expression is the bounded-dim fast path.
  */
object BloomKernel {
  /** Pack k + bitset words into the self-describing byte form. */
  def serialize(k: Int, words: Array[Long]): Array[Byte] = {
    require(k > 0 && k < 256, s"bloom k out of range: $k")
    val out = new Array[Byte](1 + words.length * 8)
    out(0) = k.toByte
    var w = 0
    while (w < words.length) {
      val v = words(w)
      var b = 0
      while (b < 8) {
        out(1 + w * 8 + b) = ((v >>> (8 * b)) & 0xff).toByte
        b += 1
      }
      w += 1
    }
    out
  }

  /** Set the k probe bits for `value` in `words` (numBits = 64·len,
    * must be a power of two).
    */
  def add(words: Array[Long], value: Long, k: Int): Unit = {
    val numBits = words.length * 64
    val h1 = XXH64.hashLong(value, 0L)
    val h2 = XXH64.hashLong(value, 1L)
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & (numBits - 1)).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe the serialized form. Referenced directly by the generated
    * code — keep the signature stable.
    */
  def contains(bloom: Array[Byte], value: Long): Boolean = {
    val k = bloom(0) & 0xff
    val numBits = (bloom.length - 1) * 8
    val h1 = XXH64.hashLong(value, 0L)
    val h2 = XXH64.hashLong(value, 1L)
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & (numBits - 1)).toInt
      val byte = bloom(1 + (bit >>> 3))
      if (((byte >>> (bit & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  /** Smallest power-of-two bit count giving ≤ `fpp` at `expectedKeys`
    * with the optimal k for that m, and that k. Standard sizing:
    * m = n·ln(fpp)/ln(2)² rounded up to a power of two,
    * k = round(m/n·ln 2) clamped to [1, 16].
    */
  def sizeFor(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1)
    val mIdeal = math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2)))
    val m = math.max(64, java.lang.Long.highestOneBit(
      math.max(64L, mIdeal.toLong * 2 - 1)))
    require(m <= (1L << 30), s"bloom too large: $m bits")
    val k = math.max(1, math.min(16,
      math.round(m.toDouble / expectedKeys * math.log(2)).toInt))
    (m.toInt, k)
  }
}

/** Partial-aggregable Bloom build over a Long key column: IN = key,
  * BUF = bitset words (merged by OR), OUT = serialized filter.
  */
class BloomAggregator(numBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Byte]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    BloomKernel.add(buf, key, k); buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Byte] =
    BloomKernel.serialize(k, buf)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** `graft_bloom_contains(filter BINARY, key BIGINT)` — see
  * [[BloomKernel.contains]]. Null filter or null key → null (filter
  * semantics match an unknown predicate).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects (binary, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomKernel.contains(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // the static forwarder on the object's mirror class keeps the
    // generated call a plain static invoke (janino-friendly)
    defineCodeGen(ctx, ev, (bloom, key) =>
      s"graft.functions.BloomKernel.contains($bloom, $key)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFilterFn {
  val make: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_bloom_contains takes exactly 2 arguments")
    BloomMightContain(exprs.head, exprs(1))
  }

  /** Idempotent in-code registration (sessions without the extensions
    * config) — same pattern as [[TextSignatures.ensureRegistered]].
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains", make, "built-in")
}
