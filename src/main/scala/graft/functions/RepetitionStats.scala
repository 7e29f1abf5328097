package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics in one native pass:
  * total n-grams, distinct n-grams, and the frequency of the most
  * repeated n-gram. These feed the Gopher-style repetition quality
  * signals (a heavily templated or looping document has a low
  * distinct/total ratio and a dominant top n-gram).
  *
  * The declarative equivalent — explode n-grams, groupBy(doc, gram),
  * re-aggregate per doc — shuffles the full n-gram table twice for a
  * statistic that is computable where the row already is. This kernel
  * is one hash-map pass per document at corpus-scan speed
  * (cf. SURVEY.md §4, same argument as [[WordShingles]]).
  *
  * Documents shorter than `n` tokens report (0, 0, 0).
  */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("total_ngrams", LongType, nullable = false),
    StructField("distinct_ngrams", LongType, nullable = false),
    StructField("top_ngram_freq", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  def compute(text: UTF8String, n: Int): InternalRow = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var top = 0
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](
      (toks.length - n + 1).toLong, counts.size.toLong, top.toLong))
  }
}
