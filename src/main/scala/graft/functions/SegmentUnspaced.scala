package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Script-aware segmentation kernel
  * ([[graft.operators.TextOps.segmentIfUnspaced]]'s hot form): when a
  * document's average space-separated chunk exceeds `maxAvgChunk`
  * characters (an unsegmented script — CJK, Thai, one giant token),
  * rewrite it as overlapping character `gram`-grams joined by single
  * spaces; otherwise return the input UNCHANGED (zero-copy — the very
  * same UTF8String).
  *
  * Native Catalyst expression with `doGenCode`. The declarative form
  * — `when(density, array_join(transform(sequence(...), substr)))` —
  * contains higher-order functions, and ANY CodegenFallback
  * subexpression disables WHOLE-STAGE CODEGEN for the entire
  * projection even on rows where the branch never evaluates: wiring
  * the HOF form into the gate/quality/token scans measurably cost the
  * whole text-analysis family 1.5–2× (r8 budget sweep). This kernel
  * keeps the scan inside WSCG; the condition is two counters over one
  * byte pass, and spaced documents (the overwhelming bulk) pay
  * exactly that and nothing else.
  *
  * Density/char semantics match the declarative reference form
  * (`length`/`translate`/`substr` — all CODE-POINT counts in Spark):
  * spec-pinned identical (ScriptAwareSpec), the shinglesHof
  * precedent.
  */
case class SegmentUnspaced(child: Expression, gram: Int, maxAvgChunk: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"segment_unspaced needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    SegmentUnspaced.compute(input.asInstanceOf[UTF8String], gram, maxAvgChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SegmentUnspaced.compute($c, $gram, $maxAvgChunk)")

  override protected def withNewChildInternal(newChild: Expression): SegmentUnspaced =
    copy(child = newChild)

  override def prettyName: String = "segment_unspaced"
}

object SegmentUnspaced {
  def compute(text: UTF8String, gram: Int, maxAvgChunk: Int): UTF8String = {
    // the condition is ONE raw byte pass, zero allocation: chars =
    // non-continuation bytes (UTF8String.numChars semantics) and
    // spaces = 0x20 bytes (0x20 can never occur inside a multi-byte
    // UTF-8 sequence — continuation bytes are >= 0x80). This matters
    // because the stateless expression builders (qualityScoreExpr,
    // predictedLangExpr) duplicate this subtree several times per row
    // inside interpreted projections the markerCount HOF forces — a
    // toString here allocated the full document per duplicate.
    val nBytes = text.numBytes()
    var chars = 0
    var spaces = 0
    var bi = 0
    while (bi < nBytes) {
      val b = text.getByte(bi)
      if ((b & 0xC0) != 0x80) {
        chars += 1
        if (b == 0x20) spaces += 1
      }
      bi += 1
    }
    // trigger: length(text) > maxAvgChunk AND
    //          length(text) > (spaces + 1) * maxAvgChunk
    if (chars <= maxAvgChunk ||
        chars <= (spaces + 1).toLong * maxAvgChunk) return text
    val len = chars
    val s = text.toString
    // segmented branch: overlapping char grams joined by spaces —
    // code-POINT grams (surrogate-pair safe), matching substr()
    val cps = new Array[Int](len)
    var n = 0
    var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(n) = cp
      n += 1
      si += Character.charCount(cp)
    }
    val nGrams = math.max(n - (gram - 1), 1)
    val sb = new java.lang.StringBuilder(s.length * (gram + 1))
    var g = 0
    while (g < nGrams) {
      if (g > 0) sb.append(' ')
      var j = 0
      while (j < gram && g + j < n) {
        sb.appendCodePoint(cps(g + j))
        j += 1
      }
      g += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
