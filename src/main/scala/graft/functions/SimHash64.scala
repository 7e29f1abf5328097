package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 62-bit SimHash over the distinct word `n`-gram shingles of a
  * document, as one native codegen pass.
  *
  * Shingle features (not unigram tokens): on a corpus with a small
  * shared vocabulary every document contains nearly every token, so a
  * token-set SimHash collapses — all signatures converge on the
  * vocabulary's signature and Hamming proximity stops meaning textual
  * similarity. Word n-grams are arrangement-specific (the feature
  * space is vocab^n), which keeps the signature discriminative and
  * aligns SimHash's notion of similarity with the n-gram Jaccard and
  * MinHash detectors. A document shorter than `n` tokens contributes
  * its whole text as a single feature.
  *
  * Each shingle is hashed twice with a Horner polynomial hash over its
  * UTF-8 bytes — bases 257 and 263, both mod the Mersenne prime 2^31-1
  * — then finalized with a bijective 31-bit xorshift-multiply
  * avalanche, giving 31 well-mixed bits per hash, 62 total. Per-bit ±1
  * votes are accumulated over the distinct shingles; the sign of each
  * counter becomes the output bit (bits 62-63 are always zero).
  *
  * The mod-2^31-1 family is chosen over murmur/xxhash for the same
  * reason as [[RollingFingerprint]]: every intermediate fits a signed
  * 64-bit integer, so the exact signature — and hence the exact
  * candidate-pair set of the LSH blocking built on it — can be
  * replayed by any engine with plain BIGINT arithmetic. The DuckDB
  * oracle recomputes it from the raw text and hash-checks the pairs.
  *
  * The declarative equivalent — explode shingles, groupBy(doc) with 62
  * conditional sums, fold the columns back into one long — costs an
  * exchange over the shingle table and a 62-wide aggregate. A
  * document's shingles are already colocated in its row, so the
  * shuffle exists only because the plan can't see that; this kernel
  * computes the signature where the row is, at corpus-scan speed.
  */
case class SimHash64(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  final val Mod = 2147483647L // 2^31 - 1 (Mersenne prime)
  final val BaseA = 257L
  final val BaseB = 263L
  final val Bits = 62 // 31 per mixed polynomial hash
  final val Mask = 0x7FFFFFFFL // low 31 bits
  // Odd 31-bit avalanche multipliers (xorshift-multiply finalizer).
  final val MixC1 = 0x45d9f3bL
  final val MixC2 = 0x119de1f3L

  /** Horner fold over UTF-8 bytes: sum b_i * Base^(L-1-i) mod Mod.
    * Every intermediate < 2^40 — BIGINT-safe in any engine.
    */
  def polyHash(bytes: Array[Byte], base: Long): Long = {
    var h = 0L; var i = 0
    while (i < bytes.length) { h = (h * base + (bytes(i) & 0xff)) % Mod; i += 1 }
    h
  }

  /** Bijective 31-bit avalanche finalizer: xorshift + odd-multiply
    * mod 2^31, three rounds. A raw polynomial hash of a short feature
    * is a small number (high bits all zero), which biases the per-bit
    * votes and clusters signatures; the finalizer spreads every input
    * over all 31 bits. Odd multipliers are bijections mod 2^31 and
    * right-xorshifts are bijections, so no collisions are introduced.
    * Products stay < 2^62 and xor/shift/& are plain BIGINT ops — the
    * oracle replays this exactly.
    */
  def mix(h0: Long, s1: Int, s2: Int, s3: Int): Long = {
    var h = h0
    h ^= h >>> s1
    h = (h * MixC1) & Mask
    h ^= h >>> s2
    h = (h * MixC2) & Mask
    h ^= h >>> s3
    h
  }

  private def vote(feature: String, counters: Array[Int]): Unit = {
    val bytes = feature.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h1 = mix(polyHash(bytes, BaseA), 16, 13, 16)
    val h2 = mix(polyHash(bytes, BaseB), 15, 14, 15)
    var b = 0
    while (b < 31) {
      if (((h1 >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
      if (((h2 >>> b) & 1L) == 1L) counters(31 + b) += 1
      else counters(31 + b) -= 1
      b += 1
    }
  }

  def compute(text: UTF8String, n: Int): Long = {
    val str = text.toString
    val toks = str.split(" ", -1)
    val counters = new Array[Int](Bits)
    if (toks.length < n) {
      vote(str, counters)
    } else {
      val seen = new java.util.HashSet[String](toks.length * 2)
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
        if (seen.add(s)) vote(s, counters)
        i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
