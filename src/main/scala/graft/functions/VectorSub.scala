package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Element-wise difference of two `array<float>` vectors — the
  * residual kernel for IVF-PQ (`x - cell_centroid`).
  *
  * Native codegen like [[VectorDot]]: Spark's own `zip_with` is a
  * CodegenFallback higher-order function, interpreted per element —
  * unacceptable on a corpus-wide residual projection. Result elements
  * are single-precision IEEE differences (the storage type of the
  * embedding column); mismatched lengths subtract the common prefix;
  * null inputs yield null.
  */
case class VectorSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_sub needs two array<float> inputs, " +
          s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorSub.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorSub.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSub =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_sub"
}

object VectorSub {
  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i) - b.getFloat(i); i += 1 }
    new GenericArrayData(out)
  }
}
