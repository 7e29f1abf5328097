package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two `array<float>` embedding columns, in double
  * precision.
  *
  * Native Catalyst expression with `doGenCode`: the multiply-accumulate
  * loop compiles straight into the enclosing WholeStageCodegen stage.
  * Spark's own higher-order functions (`zip_with`+`aggregate`) cannot
  * codegen (CodegenFallback), which makes them interpreted per element —
  * two orders of magnitude slower on a 64-dim corpus scan. This is the
  * hot scalar kernel of every similarity operator (SURVEY.md §2), so it
  * gets the native treatment.
  *
  * Mismatched lengths dot the common prefix; null array inputs yield
  * null (BinaryExpression null-intolerance).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_dot needs two array<float> inputs, " +
          s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorDot.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
}
