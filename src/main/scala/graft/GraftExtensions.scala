package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, NormalizeExpression, TextSignatures}

/** Session-extension injector — the supported way to ship the engine's
  * native expressions and optimizer rules to every session of a
  * cluster:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Injects:
  *   - `graft_dot` (native dot-product expression), resolvable in SQL
  *     text and `expr(...)` plans without per-query registration (the
  *     in-code fallback
  *     [[graft.functions.VectorExpressions.ensureRegistered]] covers
  *     sessions created without the config);
  *   - [[graft.plans.NullFilterToAntiJoin]], the left-join-IS-NULL →
  *     anti-join rewrite Catalyst lacks.
  *
  * This is the brief's extension point (c): SparkSessionExtensions for
  * engine-level additions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(
        classOf[graft.functions.SimHashSig].getName, "graft_simhash"),
      TextSignatures.makeSimhash))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
      TextSignatures.makeMinhash))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram_md5"),
      new ExpressionInfo(
        classOf[graft.functions.NgramMd5].getName, "graft_ngram_md5"),
      TextSignatures.makeNgramMd5))
    ext.injectFunction((
      FunctionIdentifier("graft_lev"),
      new ExpressionInfo(
        classOf[graft.functions.BoundedLevenshtein].getName, "graft_lev"),
      graft.functions.BoundedLevenshteinFn.make))
    ext.injectFunction((
      FunctionIdentifier("graft_compress_bp"),
      new ExpressionInfo(
        classOf[graft.functions.CompressRatioBp].getName,
        "graft_compress_bp"),
      graft.functions.CompressRatio.make))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(
        classOf[graft.functions.NfcNormalize].getName, "graft_nfc"),
      NormalizeExpression.make))
    ext.injectFunction((
      FunctionIdentifier("graft_del_variants"),
      new ExpressionInfo(
        classOf[graft.functions.DeletionVariants].getName,
        "graft_del_variants"),
      graft.functions.DeletionVariantsFn.make))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[graft.functions.BloomMightContain].getName,
        "graft_bloom_contains"),
      graft.functions.BloomFilterFn.make))
    ext.injectOptimizerRule(_ => graft.plans.NullFilterToAntiJoin)
  }
}
