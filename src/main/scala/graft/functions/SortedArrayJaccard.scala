package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact Jaccard |A∩B| / |A∪B| of two SORTED-DISTINCT long arrays via
  * a single merge walk — the verify kernel paired with
  * [[ShingleHashes]].
  *
  * The declarative form `size(array_intersect(a, b)) /
  * size(array_union(a, b))` builds two throwaway arrays (each backed
  * by a hash map probe) per pair; on a verify join that evaluates
  * millions of candidate pairs per partition the allocation traffic is
  * the cost. Sorted inputs make set intersection a two-pointer count —
  * no allocation, no hashing — and |A∪B| = |A| + |B| − |A∩B|.
  *
  * Null result when the union is empty (both arrays empty), matching
  * the declarative form's 0/0 → null under non-ANSI division, so a
  * `jaccard >= t` filter drops the pair either way. Inputs MUST be
  * sorted ascending and distinct ([[ShingleHashes]]'s output
  * contract); nothing is verified at runtime — garbage in, garbage
  * out, exactly like feeding unsorted arrays to a merge join.
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def okType(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_array_jaccard needs two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayJaccard.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not a literal: with two non-nullable inputs
      // nullSafeCodeGen inlines this block unbraced, so a second
      // sorted_array_jaccard in the same codegen scope would redeclare
      // a fixed-name local and fail janino (ADVICE r14).
      val jr = ctx.freshName("jr")
      s"""
      Object $jr = graft.functions.SortedArrayJaccard.compute($a, $b);
      if ($jr == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $jr).doubleValue(); }
    """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_array_jaccard"
}

object SortedArrayJaccard {
  /** Boxed so codegen and eval share one null-on-empty-union path. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la + lb == 0) return null
    var i = 0
    var j = 0
    var inter = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(inter.toDouble / (la + lb - inter))
  }
}
