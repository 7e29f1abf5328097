package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

/** Bloom-filter membership test against BROADCAST packed bits — the
  * cluster-scale form of [[graft.operators.BloomJoin.mightContain]].
  *
  * The literal form embeds the bit array in the plan: fine at the
  * default 2^14 bits, but the useful runtime-filter regime at 100 TB
  * (hundreds of millions of build keys → 2^30 bits) would put a
  * multi-hundred-MB array literal into every task's serialized plan.
  * Here the bits are packed 64-per-long and shipped ONCE per executor
  * as a torrent broadcast; the expression carries only the broadcast
  * handle (bytes, not the filter), and the generated code caches the
  * unwrapped array in codegen mutable state so the per-row cost is k
  * multiply-mod probes + k word lookups — identical arithmetic to the
  * literal form (same affine family over 2^31−1), so the two agree on
  * every key (BloomJoinSpec asserts it).
  *
  * Null keys yield null (UnaryExpression null-intolerance), matching
  * the literal form, where `pmod(null, …)` is null.
  */
case class BloomBitsContain(child: Expression,
    bits: Broadcast[Array[Long]], mBits: Long, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits_contain needs an integral key, got ${other.simpleString}")
  }

  override protected def nullSafeEval(key: Any): Any = {
    val keyL = key match {
      case i: Int => i.toLong
      case l: Long => l
    }
    BloomBitsContain.contains(bits.value, keyL, mBits, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBits", bits,
      classOf[Broadcast[Array[Long]]].getName)
    // unwrap the broadcast once per codegen instance, not per row
    val arr = ctx.addMutableState("long[]", "bloomArr")
    nullSafeCodeGen(ctx, ev, key => s"""
      if ($arr == null) { $arr = (long[]) $bcRef.value(); }
      ${ev.value} = graft.functions.BloomBitsContain.contains(
        $arr, (long) $key, ${mBits}L, $k);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBitsContain =
    copy(child = newChild)

  // keep the plan string filter-free: print the size, never the bits
  override def toString: String = s"bloom_bits_contain($child, m=$mBits, k=$k)"
  override def prettyName: String = "bloom_bits_contain"
}

object BloomBitsContain {
  private val Mod = MinHashSig.Mod // 2^31 - 1

  /** h_i(key) = ((a_i · (key mod p) + b_i) mod p) mod mBits — the same
    * affine family as the column-expression form, evaluated in plain
    * long arithmetic (every intermediate < 2^62).
    */
  def bitPos(key: Long, i: Int, mBits: Long): Long = {
    val x = ((key % Mod) + Mod) % Mod
    ((x * MinHashSig.coeffA(i) + MinHashSig.coeffB(i)) % Mod) % mBits
  }

  def contains(words: Array[Long], key: Long, mBits: Long, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val pos = bitPos(key, i, mBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }
}
