package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding hot path.
  *
  * Why not built-ins: a 64-dim dot product as SQL is either an
  * interpreted higher-order `aggregate` (CodegenFallback — 10×+ slower
  * in the similarity joins) or a 64-term unrolled addition chain, which
  * at 8 hyperplanes × 64 dims overflows janino's 64 KB method limit and
  * silently falls back to interpretation anyway. A `doGenCode` loop is
  * the brief's preference order (b): compact generated code, stays
  * inside whole-stage codegen, scales to any dimensionality.
  *
  * Summation order is the sequential left fold (i = 0..n-1, seed 0.0)
  * — bit-identical to DuckDB's `list_reduce(list_transform(...), +)`
  * oracle formulation, which is what makes exact-double comparisons and
  * sign tests agree across engines. Each element is widened to double
  * BEFORE the multiply, matching `CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double|tinyint> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  // array<tinyint> support serves the int8-quantized ANN path
  // (sim/Quantization): int8×int8 products (≤ 127², summed over ≤ 2^38
  // dims) are exactly representable as doubles, so the same sequential
  // fold stays deterministic.
  private def get(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case _ => s"$arr.getDouble($i)"
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def rd(e: Expression, d: ArrayData, i: Int): Double = elemType(e) match {
      case FloatType => d.getFloat(i).toDouble
      case ByteType => d.getByte(i).toDouble
      case _ => d.getDouble(i)
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += rd(left, x, i) * rd(right, y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT fixed names: with both children non-nullable,
      // nullSafeCodeGen splices this block un-braced at method scope, so
      // two DotProducts in one projection would redeclare fixed locals —
      // a janino compile error and a silent interpreted fallback.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val getX = get(left, a, i)
      val getY = get(right, b, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently register `graft_dot` in the session's function
    * registry so SQL-string plans (`expr`, `spark.sql`) can call it.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(exprs.head, exprs(1))
      },
      "built-in")
}
