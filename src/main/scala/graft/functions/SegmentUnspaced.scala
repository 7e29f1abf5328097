package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Script-aware segmentation kernel
  * ([[graft.operators.TextOps.segmentIfUnspaced]]'s hot form): every
  * space-free RUN longer than `maxRun` characters — an unsegmented
  * script passage (CJK, Thai), a URL, machine garbage — is rewritten
  * IN PLACE as its overlapping character `gram`-grams joined by
  * single spaces; every other run (all natural-language words in
  * space-delimited scripts) passes through untouched. A document with
  * no such run returns UNCHANGED (zero-copy — the very same
  * UTF8String). The per-run rule subsumes the pure-CJK whole-doc
  * case (one giant run) and, unlike a whole-document density switch,
  * also catches MIXED-script documents — an English page quoting a
  * CJK paragraph segments exactly that paragraph.
  *
  * Native Catalyst expression with `doGenCode`. The declarative form
  * (transform over split — higher-order functions) is CodegenFallback,
  * and ANY CodegenFallback subexpression disables WHOLE-STAGE CODEGEN
  * for the entire projection even on rows where nothing triggers:
  * wiring the HOF form into the gate/quality/token scans measurably
  * cost the whole text-analysis family 1.5–2× (r8 budget sweep). This
  * kernel keeps the scan inside WSCG; the trigger check is ONE raw
  * byte pass with zero allocation, and documents with no long run
  * (the overwhelming bulk) pay exactly that and nothing else.
  *
  * Char semantics match the declarative reference form (`length` /
  * `substr` — CODE-POINT counts in Spark): spec-pinned identical
  * (ScriptAwareSpec), the shinglesHof precedent.
  */
case class SegmentUnspaced(child: Expression, gram: Int, maxRun: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"segment_unspaced needs a string input, got ${child.dataType.simpleString}")
    // degenerate parameters fail at PLAN time, not silently at eval:
    // gram < 1 would emit space-joined empty grams (corrupting every
    // long run) and maxRun < gram would emit grams LONGER than the
    // run threshold is meant to allow through
    else if (gram < 1) TypeCheckResult.TypeCheckFailure(
      s"segment_unspaced needs gram >= 1, got $gram")
    else if (maxRun < gram) TypeCheckResult.TypeCheckFailure(
      s"segment_unspaced needs maxRun >= gram, got maxRun=$maxRun gram=$gram")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    SegmentUnspaced.compute(input.asInstanceOf[UTF8String], gram, maxRun)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SegmentUnspaced.compute($c, $gram, $maxRun)")

  override protected def withNewChildInternal(newChild: Expression): SegmentUnspaced =
    copy(child = newChild)

  override def prettyName: String = "segment_unspaced"
}

object SegmentUnspaced {
  def compute(text: UTF8String, gram: Int, maxRun: Int): UTF8String = {
    // trigger check: ONE raw byte pass, zero allocation — run length
    // in CODE POINTS (chars = non-continuation bytes; 0x20 can never
    // occur inside a multi-byte UTF-8 sequence, so the space test is
    // a plain byte compare). This matters because the stateless
    // expression builders (qualityScoreExpr, predictedLangExpr)
    // duplicate this subtree several times per row inside interpreted
    // projections the markerCount HOF forces — any per-row allocation
    // here multiplies.
    val nBytes = text.numBytes()
    var run = 0
    var hit = false
    var bi = 0
    while (bi < nBytes && !hit) {
      val b = text.getByte(bi)
      if ((b & 0xC0) != 0x80) {
        if (b == 0x20) run = 0
        else { run += 1; if (run > maxRun) hit = true }
      }
      bi += 1
    }
    if (!hit) return text
    // rebuild (rare branch): long runs become their code-point
    // gram-grams joined by spaces, in place; everything else verbatim
    val s = text.toString
    val out = new java.lang.StringBuilder(s.length * 2)
    var start = 0
    var first = true
    def emitRun(tok: String): Unit = {
      if (!first) out.append(' ')
      first = false
      // code-point length (surrogate-pair safe)
      val cpLen = tok.codePointCount(0, tok.length)
      if (cpLen <= maxRun) { out.append(tok); return }
      val cps = new Array[Int](cpLen)
      var n = 0
      var si = 0
      while (si < tok.length) {
        val cp = tok.codePointAt(si)
        cps(n) = cp; n += 1
        si += Character.charCount(cp)
      }
      val nGrams = math.max(n - (gram - 1), 1)
      var g = 0
      while (g < nGrams) {
        if (g > 0) out.append(' ')
        var j = 0
        while (j < gram && g + j < n) {
          out.appendCodePoint(cps(g + j)); j += 1
        }
        g += 1
      }
    }
    var ci = 0
    while (ci < s.length) {
      if (s.charAt(ci) == ' ') {
        emitRun(s.substring(start, ci))
        start = ci + 1
      }
      ci += 1
    }
    emitRun(s.substring(start))
    UTF8String.fromString(out.toString)
  }
}
