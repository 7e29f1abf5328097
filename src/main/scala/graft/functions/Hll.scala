package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** graft's deterministic HyperLogLog: column builders shared by the
  * batch sketch aggregate (Sessionize.approxStats) and its Structured
  * Streaming twin (EventStream.hourlyUserSketch), so both provably
  * compute the SAME registers — merging streamed per-window registers
  * reproduces the one-pass batch estimate exactly (max is associative
  * and idempotent).
  *
  * Register index and rho come from the 31-bit avalanche hash family
  * ([[SimHash64.mix]]); every step is BIGINT arithmetic, so the DuckDB
  * oracle replays estimates bit-for-bit (see SURVEY.md §4). The one
  * transcendental — the linear-counting table m·ln(m/V) — is computed
  * once here and embedded as literals wherever it is needed; libms
  * disagree on ln in the last ulp (measured 2/512 args vs glibc).
  */
object Hll {
  final val Mod = SimHash64.Mod // 2^31 - 1
  final val P = 9 // register-index bits
  final val M = 1L << P // 512 registers
  final val ValueBits = 31 - P // 22 rho bits; rho ∈ [1, 23]
  /** alpha_m · m² · 2^(ValueBits+1): the raw estimate is this over the
    * integer register sum ZN = Σ 2^(23-M_j) — a single IEEE division,
    * identical in any engine.
    */
  final val AlphaM2P: Double =
    (0.7213 / (1.0 + 1.079 / 512.0)) * (512.0 * 512.0 * 8388608.0)
  final val LcTable: Array[Double] =
    Array.tabulate(512)(i => 512.0 * math.log(512.0 / (i + 1)))

  /** 31-bit avalanche of a BIGINT key, normalized to [0, Mod). */
  def mix31(c: Column, s1: Int, s2: Int, s3: Int): Column = {
    val norm = (c % Mod + Mod) % Mod
    def xsr(v: Column, s: Int) =
      v.bitwiseXOR(call_function("shiftright", v, lit(s)))
    def mul(v: Column, k: Long) = (v * k).bitwiseAND(lit(SimHash64.Mask))
    xsr(mul(xsr(mul(xsr(norm, s1), SimHash64.MixC1), s2), SimHash64.MixC2), s3)
  }

  private def userHash(key: Column) = mix31(key, 16, 13, 16)

  /** Register index of a key. */
  def bucket(key: Column): Column = userHash(key).bitwiseAND(lit(M - 1L))

  /** Rank of the highest set bit of the value part → rho ∈ [1, 23]. */
  def rho(key: Column): Column = {
    val v = call_function("shiftright", userHash(key), lit(P))
    (1 to ValueBits).foldLeft(when(lit(false), 0)) { (acc, r) =>
      acc.when(v >= (1L << (ValueBits - r)), r)
    }.otherwise(ValueBits + 1)
  }

  /** Distinct-count estimate from the integer register sum and the
    * empty-register count: raw harmonic-mean HLL, switched to linear
    * counting in the small range (the standard rule).
    */
  def estimate(zn: Column, vEmpty: Column): Column = {
    val raw = lit(AlphaM2P) / zn
    // greatest(..,1): when vEmpty = 0 the branch is unused but ANSI
    // element_at still type-checks the index eagerly.
    when(vEmpty > 0 && raw <= lit(2.5 * M),
      element_at(lit(LcTable), greatest(vEmpty, lit(1L)).cast("int")))
      .otherwise(raw)
  }

  /** Aggregate expressions turning per-(group, bucket) max-rho register
    * rows into (zn, v_empty) — use inside a groupBy over the group
    * columns, with `mrho` the register column.
    */
  def znAgg(mrho: Column): Column =
    sum(call_function("shiftleft", lit(1L), lit(ValueBits + 1) - mrho)) +
      (lit(M) - count(lit(1))) * (1L << (ValueBits + 1))
  def vEmptyAgg: Column = lit(M) - count(lit(1))
}
