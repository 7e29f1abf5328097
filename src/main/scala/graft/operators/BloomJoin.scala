package graft.operators

import graft.functions.MinHashSig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi-join: the runtime-filter pattern for
  * selective big⋈small joins, exposed as an explicit primitive.
  *
  * When a fact table joins a selective key set (high-value customers,
  * flagged suppliers, a sampled cohort), the shuffle moves every fact
  * row only for most of them to find no partner. A Bloom filter of the
  * build side, applied AT THE SCAN, drops the non-matching majority
  * before the exchange — Spark's AQE injects this automatically in
  * some shapes (InjectRuntimeFilter); this primitive is for when the
  * optimizer doesn't, or the filter should persist (e.g. reused across
  * queries).
  *
  * Correctness contract: a Bloom filter has NO false negatives, so
  * `bloomSemiJoin` composes the pre-filter with the exact semi-join —
  * the result is row-identical to the plain semi-join (the oracle
  * checks exactly that); false positives only cost shuffle bytes.
  *
  * Scale shape: the build side must be dimension-sized (its k bit
  * positions are collected to the driver, like every broadcast build —
  * bounded by `mBits`, not the key count, since positions are distinct
  * before collect). The probe-side test is pure per-row arithmetic on
  * a broadcast boolean-array literal — codegen, no shuffle, no UDF.
  *
  * Hashing is the repo's portable affine family over the Mersenne
  * prime 2^31−1 ([[graft.functions.MinHashSig.coeffA]]): every
  * intermediate fits a signed 64-bit integer and any engine with plain
  * BIGINT arithmetic reproduces the same bits.
  */
object BloomJoin {

  private val Mod = MinHashSig.Mod // 2^31 - 1

  /** h_i(key) = ((a_i · (key mod p) + b_i) mod p) mod mBits — affine
    * universal family; `key mod p` first keeps a·x < 2^62.
    */
  private def bitPos(key: Column, i: Int, mBits: Int): Column =
    pmod(pmod(pmod(key, lit(Mod)) * lit(MinHashSig.coeffA(i))
      + lit(MinHashSig.coeffB(i)), lit(Mod)), lit(mBits.toLong))

  /** Build the filter: the build side's distinct bit positions, packed
    * into a boolean array. The distinct runs distributed (bounded by
    * mBits rows); only the ≤mBits positions reach the driver.
    */
  def buildBits(keys: DataFrame, keyCol: String, mBits: Int = 1 << 14,
                k: Int = 3): Array[Boolean] = {
    val bits = new Array[Boolean](mBits)
    keys.select(explode(array((0 until k).map(i =>
        bitPos(col(keyCol), i, mBits)): _*)).as("pos"))
      .distinct()
      .collect()
      .foreach(r => bits(r.getLong(0).toInt) = true)
    bits
  }

  /** The membership test as a pure column expression over the packed
    * bits — k array lookups AND'ed, all inside codegen.
    */
  def mightContain(key: Column, bits: Array[Boolean], k: Int = 3): Column = {
    val bitsLit = typedlit(bits.toSeq)
    (0 until k).map(i =>
      element_at(bitsLit, bitPos(key, i, bits.length).cast("int") + 1))
      .reduce(_ && _)
  }

  /** Exact semi-join accelerated by the Bloom pre-filter: row-identical
    * to `big.join(keys, _, "left_semi")`, but the scan drops the
    * non-matching majority before the exchange.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    keys: DataFrame, keyCol: String,
                    mBits: Int = 1 << 14, k: Int = 3): DataFrame = {
    val bits = buildBits(keys, keyCol, mBits, k)
    big.filter(mightContain(col(bigKey), bits, k))
      .join(keys.select(col(keyCol).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
