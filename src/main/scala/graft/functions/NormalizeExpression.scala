package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark has NO
  * built-in normalizer (SPARK-35346 open for years), yet corpus
  * cleaning needs one: the same visible text arrives composed (é) and
  * decomposed (e +  ́) from different crawls, and every downstream
  * exact-dedup hash, shingle, and token split sees them as different
  * bytes unless a normalization pass runs first.
  *
  * The kernel is `java.text.Normalizer` (ICU-equivalent for NFC) called
  * from `doGenCode` as a static method — stays inside whole-stage
  * codegen like [[TextKernels]]. DuckDB's `nfc_normalize` implements
  * the same Unicode normalization form, so outputs are byte-identical
  * cross-engine (the t15 oracle hash-checks exactly that).
  */
object NormalizeKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost
    // all real text is already NFC — skip the allocating normalize
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` — see [[NormalizeKernel.nfc]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NormalizeExpression {
  val make: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_nfc takes exactly 1 argument")
    NfcNormalize(exprs.head)
  }

  /** Idempotent in-code registration, same pattern as
    * [[TextSignatures.ensureRegistered]].
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", make, "built-in")
}
