package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable 31-bit string hash: Horner polynomial over the UTF-8 bytes
  * (base 257 mod the Mersenne prime 2^31-1) + the xorshift-multiply
  * avalanche — the EXACT per-shingle hash inside [[MinHashSig]] and
  * [[SimHash64]], exposed as a scalar so set-grain operators
  * (Count–Min sketches, bucket routing) hash single tokens at scan
  * speed inside WholeStageCodegen.
  *
  * Every intermediate is BIGINT-safe, so the DuckDB oracle replays the
  * value with the same recursive-powers CTE the MinHash oracle uses —
  * a murmur `hash()` could not be replayed outside the JVM.
  */
case class StringHash31(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"string_hash31 needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    StringHash31.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringHash31.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StringHash31 =
    copy(child = newChild)

  override def prettyName: String = "string_hash31"
}

object StringHash31 {
  def compute(s: UTF8String): Long =
    SimHash64.mix(SimHash64.polyHash(s.getBytes, SimHash64.BaseA), 16, 13, 16)
}
