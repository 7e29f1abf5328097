package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles ("a b c" style) of a space-tokenized document
  * — distinct in first-occurrence order by default, or every
  * occurrence in position order (`keepDuplicates = true`, for
  * frequency-weighted uses like collocation counting).
  *
  * Native Catalyst expression with `doGenCode`. The equivalent
  * declarative form — `array_distinct(filter(transform(sequence(...),
  * slice+array_join)))` — is a chain of higher-order functions, which
  * are CodegenFallback (interpreted per element) and allocate a lambda
  * frame per position. This single pass builds each shingle once and
  * dedups with a hash set; it is the per-row kernel under every text
  * dedup operator (MinHash, n-gram Jaccard), so it runs at corpus-scan
  * scale.
  *
  * Tokenization matches `split(text, " ", -1)` (Java semantics,
  * trailing empties kept) so results are identical to the declarative
  * form on any input.
  */
case class WordShingles(child: Expression, n: Int,
                        keepDuplicates: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, keepDuplicates)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n, $keepDuplicates)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  def compute(text: UTF8String, n: Int): ArrayData = compute(text, n, false)

  def compute(text: UTF8String, n: Int, keepDuplicates: Boolean): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen =
      if (keepDuplicates) null
      else new java.util.LinkedHashSet[String](toks.length * 2)
    val dup =
      if (keepDuplicates) new java.util.ArrayList[String](toks.length) else null
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
      if (keepDuplicates) dup.add(sb.toString) else seen.add(sb.toString)
      i += 1
    }
    val src: java.util.Collection[String] = if (keepDuplicates) dup else seen
    val out = new Array[Any](src.size)
    val it = src.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
