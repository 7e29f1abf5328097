package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling-hash document fingerprint.
  *
  * Slides a `window`-byte polynomial hash (base 257 mod the Mersenne
  * prime 2^31-1) across the UTF-8 bytes and returns the minimum window
  * hash — the winnowing-style fingerprint used for near-duplicate
  * sketching. Documents shorter than the window hash in full.
  *
  * The modulus is chosen so every intermediate fits in a signed 64-bit
  * integer (h*B + c < 2^40): the recurrence is reproducible in ANY
  * engine with plain BIGINT arithmetic — the DuckDB oracle replays it
  * with a recursive CTE — where a wrapping-2^64 hash would not be
  * (engines that error on overflow can't express it).
  *
  * Native Catalyst expression with `doGenCode`: the per-row work compiles
  * straight into the generated Java of the enclosing WholeStageCodegen
  * stage (no UDF boxing, no codegen fence). This is the preferred pattern
  * for scalar functions Spark lacks (SURVEY.md §4).
  */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint needs a string input, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String].getBytes, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprint.compute($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}

object RollingFingerprint {
  final val Base = 257L
  final val Mod = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Minimum rolling hash over all `w`-byte windows (mod-M arithmetic;
    * every intermediate < 2^41, BIGINT-safe in any engine).
    */
  def compute(bytes: Array[Byte], w: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    if (n <= w) {
      var h = 0L; var i = 0
      while (i < n) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
      return h
    }
    // pow = Base^w mod M, for removing the byte leaving the window
    var pow = 1L; var i = 0
    while (i < w) { pow = pow * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    var min = h
    while (i < n) {
      h = (h * Base + (bytes(i) & 0xff) - pow * (bytes(i - w) & 0xff)) % Mod
      if (h < 0) h += Mod
      if (h < min) min = h
      i += 1
    }
    min
  }
}
