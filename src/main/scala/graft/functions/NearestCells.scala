package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Top-`n` nearest coarse cells (by cosine) for one embedding, as ONE
  * codegen'd projection: embedding in, ordered `array<long>` of cell
  * ids out.
  *
  * This is the IVF assignment/probe kernel. The relational form it
  * replaces — `crossJoin(centroids)` + a per-vector rank window —
  * materializes a corpus×cells fan-out INTO A SHUFFLE before the rank
  * filter can cut it: at a realistic 2^14–2^16-cell quantizer that is
  * a 10⁴–10⁵× row blow-up exchanged and sorted per vector, the one
  * plan shape that cannot survive a 100× scale-up. Here the centroid
  * matrix rides along as a task-constant reference object (the
  * [[PqCodes]] precedent — not a source literal, not a join input),
  * the argmax loop runs inside WholeStageCodegen, and the scan emits
  * exactly `n` cells per vector with zero row inflation and zero
  * shuffle.
  *
  * Exact parity with the window form it replaces (spec-pinned at 1k+
  * cells, NearestCellsSpec):
  *  - the per-cell cosine reproduces [[VectorCosine.compute]] bit for
  *    bit — same index-ordered double MAC over min(len, dim) elements;
  *  - ordering is (cosine DESC, cell_id ASC): `cellIds` is sorted
  *    ascending at construction and insertion uses strict `>`, so on
  *    an exact tie the earlier (smaller) cell id keeps its slot;
  *  - a NaN cosine (zero-norm vector or centroid) ranks ABOVE every
  *    real value, matching Spark's double ordering in the window's
  *    `orderBy(desc)`. Real cosines live in [-1, 1], so NaN maps to
  *    the sentinel 2.0 without colliding.
  */
case class NearestCells(child: Expression, cellIds: Array[Long],
                        centroids: Array[Float], dim: Int, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if n >= 1 && dim >= 1 && cellIds.nonEmpty &&
        centroids.length == cellIds.length * dim =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells: ${centroids.length} centroid floats / " +
        s"${cellIds.length} cell ids do not factor into dim=$dim (n=$n)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  def compute(a: ArrayData): ArrayData = {
    val m = cellIds.length
    val take = math.min(n, m)
    val bestSim = new Array[Double](take)
    val bestId = new Array[Long](take)
    java.util.Arrays.fill(bestSim, Double.NegativeInfinity)
    val len = math.min(a.numElements(), dim)
    var c = 0
    while (c < m) {
      val off = c * dim
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < len) {
        val x = a.getFloat(i).toDouble
        val y = centroids(off + i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // NaN sorts above any real cosine (Spark double ordering);
      // cosines are in [-1, 1] so 2.0 is a safe order key for it
      val sim = if (java.lang.Double.isNaN(cos)) 2.0 else cos
      if (sim > bestSim(take - 1)) {
        var p = take - 1
        while (p > 0 && sim > bestSim(p - 1)) {
          bestSim(p) = bestSim(p - 1); bestId(p) = bestId(p - 1); p -= 1
        }
        bestSim(p) = sim; bestId(p) = cellIds(c)
      }
      c += 1
    }
    new GenericArrayData(if (take == n) bestId
    else java.util.Arrays.copyOf(bestId, take))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}
