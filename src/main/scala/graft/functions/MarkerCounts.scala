package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language stopword-marker INSTANCE counts in one text pass:
  * `markers` is a list of word sets, the result an array with, for
  * each set, the number of whitespace tokens that belong to it —
  * exactly `size(filter(split(text, ' '), t => t.isin(ws)))` per set
  * ([[graft.operators.TextAnalysis]]'s scoring definition, so every
  * lang-id / quality oracle stays hash-green).
  *
  * Native Catalyst expression with `doGenCode`. The declarative form
  * is one `filter(...)` higher-order function PER LANGUAGE — each is
  * CodegenFallback, so the whole gate/quality/lang projection ran
  * interpreted AND re-walked the token array four times (measured
  * ~0.08 s per marker per corpus pass at sf0.1). This kernel splits
  * once and resolves all sets in a single walk, keeping the
  * projection inside whole-stage codegen.
  */
case class MarkerCounts(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"marker_counts needs a string input, got ${child.dataType.simpleString}")

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    markers.map { ws =>
      val h = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(h.add)
      h
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    MarkerCounts.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MarkerCounts.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)

  override def prettyName: String = "marker_counts"
}

object MarkerCounts {
  def compute(text: UTF8String,
              sets: Array[java.util.HashSet[String]]): ArrayData = {
    val counts = new Array[Long](sets.length)
    val s = text.toString
    var start = 0
    var i = 0
    def emit(tok: String): Unit = {
      var k = 0
      while (k < sets.length) {
        if (sets(k).contains(tok)) counts(k) += 1
        k += 1
      }
    }
    while (i < s.length) {
      if (s.charAt(i) == ' ') {
        emit(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    emit(s.substring(start))
    new GenericArrayData(counts)
  }
}
