package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization encoder as ONE codegen'd projection: embedding
  * in, `array<int>` of `m` nearest-centroid codes out.
  *
  * The codebook (flattened `[sub][code][dim]`, plus a presence mask
  * for codes the trainer never materialized) rides along as a
  * reference object — a task-constant the generated code indexes
  * directly, NOT a 64 KB source literal and NOT a join input. That is
  * the point at 100 TB: the equivalent relational encode (broadcast
  * codebook join + per-(vector,subspace) argmin aggregate) inflates
  * the scan by k rows per subspace before the partial aggregate can
  * shrink it; this expression does the same argmin in a tight loop
  * inside WholeStageCodegen with zero row inflation and zero shuffle.
  *
  * Distance arithmetic reproduces the relational path bit for bit —
  * per candidate `(saa - 2*sab) + sbb` with each running sum
  * accumulated in index order, ties broken toward the lower code — so
  * PqSpec can assert exact code parity between the two paths. A
  * subspace with no present codes yields code 0 (degenerate codebooks
  * are rejected at training time). Vector length must be divisible by
  * `m`; trailing dims of a shorter-than-trained vector read as an
  * index error at eval time, matching the relational path's behavior
  * of scoring only what it is given.
  */
case class PqCodes(child: Expression, codebook: Array[Float],
                   present: Array[Boolean], m: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if m >= 1 && k >= 1 &&
      codebook.length % (m.toLong * k) == 0 &&
      present.length == m * k => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"pq_codes codebook of ${codebook.length} floats / mask of " +
        s"${present.length} does not factor into m=$m k=$k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes needs array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  def compute(a: ArrayData): ArrayData = {
    val subDim = codebook.length / (m * k)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var saa = 0.0
      var i = 0
      while (i < subDim) {
        val x = a.getFloat(off + i).toDouble; saa += x * x; i += 1
      }
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        if (present(s * k + c)) {
          val cb = (s * k + c) * subDim
          var sab = 0.0
          var sbb = 0.0
          i = 0
          while (i < subDim) {
            val x = a.getFloat(off + i).toDouble
            val y = codebook(cb + i).toDouble
            sab += x * y; sbb += y * y; i += 1
          }
          val d2 = (saa - 2.0 * sab) + sbb
          if (d2 < bestD) { bestD = d2; best = c }
        }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}
