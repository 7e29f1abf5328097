package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature (k 32-bit mins) over the distinct word n-gram
  * shingles of a document, in one native codegen pass.
  *
  * Hash family is bit-identical to the declarative
  * `min(hash(shingle, lit(i)))` formulation: Spark's murmur3
  * HashExpression folds left, so `hash(s, i)` =
  * `hashInt(i, hashUnsafeBytes(s, seed=42))` — one string hash per
  * shingle plus k cheap int hashes.
  *
  * The declarative build explodes shingles and groupBys the doc for k
  * min-aggregates; a document's shingles are colocated in its row, so
  * that exchange moves data for nothing. Returns null when the document
  * has no shingles (shorter than n tokens) — matching the explode
  * formulation, where such documents produce no rows.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("mhs")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $out =
        graft.functions.MinHashSig.compute($c, $n, $k);
      if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Returns null when the document yields no shingles. */
  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String](toks.length * 2)
    val mins = Array.fill(k)(Int.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        val u = UTF8String.fromString(s)
        val base = Murmur3_x86_32.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
        var h = 0
        while (h < k) {
          val v = Murmur3_x86_32.hashInt(h, base)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
