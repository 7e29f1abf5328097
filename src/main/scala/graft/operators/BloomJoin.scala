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
    *
    * NULL build keys are dropped: a Bloom filter cannot represent
    * NULL, and the exact semi-join behind the pre-filter never
    * matches a NULL key either (equality join), so excluding them
    * keeps the composed result exactly row-identical.
    */
  def buildBits(keys: DataFrame, keyCol: String, mBits: Int = 1 << 14,
                k: Int = 3): Array[Boolean] = {
    val bits = new Array[Boolean](mBits)
    keys.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(i =>
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

  // ------------------------------------------------------------------
  // Scale variant: packed bits + broadcast variable. The literal form
  // above stays the oracle path (its bits ride the plan — fine at
  // 2^14); this form is for the regime a runtime filter actually earns
  // its keep in at 100 TB — mBits up to 2^30, where a plan literal
  // would be hundreds of MB serialized into every task.
  // ------------------------------------------------------------------

  /** Build the filter as 64-per-long packed words. The per-word OR
    * runs DISTRIBUTED (bit_or hash aggregate over the exploded bit
    * positions — partial-agg friendly, ≤ mBits/64 result rows); only
    * the packed words reach the driver, so the collect is mBits/8
    * bytes regardless of build-side key count. NULL build keys are
    * dropped, exactly as in [[buildBits]] (the semi-join never
    * matches them, so the composed result is unchanged).
    */
  /** Sentinel for `mBits` on the packed family: size the filter from
    * a build-side count at ~10 bits/key (k=3 → ~1.7% false positives),
    * next power of two, clamped [2^14, 2^30]. This is the DEFAULT —
    * the old fixed 2^20 silently saturated past ~10^5 build keys
    * (fp → 1, the pre-filter stops filtering; never wrong — the exact
    * semi-join stays behind it — just wasted work). A fixed mBits is
    * an explicit opt-in; the build side is the SMALL side, so the
    * count is one cheap driver-bounded job.
    */
  val AutoBits = 0

  def regimeMBits(buildKeys: Long): Int = {
    val wanted = math.max(1L, buildKeys) * 10L
    var m = 1 << 14
    while (m < wanted && m < (1 << 30)) m <<= 1
    m
  }

  private def resolveMBits(keys: DataFrame, mBits: Int): Int =
    if (mBits != AutoBits) mBits else regimeMBits(keys.count())

  def buildPackedBits(keys: DataFrame, keyCol: String,
                      mBits0: Int = AutoBits, k: Int = 3): Array[Long] = {
    val mBits = resolveMBits(keys, mBits0)
    require(mBits > 0 && (mBits & (mBits - 1)) == 0, "mBits must be a power of 2")
    // whole words only: with power-of-2 mBits >= 64 the packed array
    // length is a BIJECTION of the geometry, which is what lets the
    // probe-side guard verify build/probe agreement from the broadcast
    // alone. A sub-word filter (mBits <= 32) shares its 1-word length
    // with mBits=64, so a mismatched pairing (build 64 / probe 32)
    // would pass any length check yet probe wrong bit positions —
    // silent false negatives in the pre-filter. Nothing real wants a
    // <64-bit bloom filter (AutoBits floors at 2^14).
    require(mBits >= 64, s"mBits=$mBits: packed filters must be >= 64 bits")
    val words = new Array[Long]((mBits + 63) >> 6)
    keys.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(i =>
        bitPos(col(keyCol), i, mBits)): _*)).as("pos"))
      .groupBy(call_function("shiftright", col("pos"), lit(6)).as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("pos"), lit(64L)).cast("int"))).as("m"))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Membership test against broadcast packed bits — a native codegen
    * expression carrying only the broadcast HANDLE in the plan
    * ([[graft.functions.BloomBitsContain]]); same affine family, so it
    * agrees with [[mightContain]] on every key.
    */
  def mightContainPacked(key: Column,
                         bits: org.apache.spark.broadcast.Broadcast[Array[Long]],
                         mBits: Long, k: Int = 3): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BloomBitsContain(
        org.apache.spark.sql.graft.Bridge.expression(key), bits, mBits, k))

  /** Build AND broadcast the packed filter, returning the handle so
    * the caller owns its lifetime — `bc.unpersist()`/`destroy()` once
    * every action over the filtered plan has run. At the advertised
    * 2^30 bits the payload is 128 MB per executor; an unreachable
    * handle would pin it until driver GC.
    */
  def broadcastPackedBits(keys: DataFrame, keyCol: String,
                          mBits: Int = AutoBits, k: Int = 3)
      : org.apache.spark.broadcast.Broadcast[Array[Long]] =
    keys.sparkSession.sparkContext
      .broadcast(buildPackedBits(keys, keyCol, mBits, k))

  /** [[bloomSemiJoin]] against a caller-owned broadcast filter (from
    * [[broadcastPackedBits]]) — row-identical output (the exact
    * semi-join behind the pre-filter is unchanged; BloomJoinSpec
    * asserts parity at mBits = 2^20). The caller unpersists `bc` after
    * its last action over the result.
    */
  def bloomSemiJoinPacked(big: DataFrame, bigKey: String,
                          keys: DataFrame, keyCol: String,
                          bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
                          mBits: Int, k: Int): DataFrame = {
    // the packed array's length IS the geometry: a caller-supplied
    // mBits that disagrees would probe the wrong bit positions and
    // silently drop matching rows — fail fast instead. Build enforces
    // power-of-2 mBits >= 64, so words = mBits/64 is a bijection and
    // this check is EXACT (a rounded-word compare admitted build=64 /
    // probe=32 — both 1 word, inconsistent bit positions).
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits=$mBits: packed probes require a power-of-2 geometry >= 64 bits")
    require(mBits.toLong >> 6 == bc.value.length.toLong,
      s"mBits=$mBits disagrees with the broadcast filter's " +
        s"${bc.value.length} words (${bc.value.length.toLong * 64} bits)")
    big.filter(mightContainPacked(col(bigKey), bc, mBits, k))
      .join(keys.select(col(keyCol).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** Convenience form that builds and broadcasts the filter itself.
    * The broadcast handle is NOT returned: fine for one-shot queries
    * (freed on driver GC), but iterative callers should use
    * [[broadcastPackedBits]] + the handle overload for deterministic
    * cleanup.
    */
  def bloomSemiJoinPacked(big: DataFrame, bigKey: String,
                          keys: DataFrame, keyCol: String,
                          mBits: Int = AutoBits, k: Int = 3): DataFrame = {
    val m = resolveMBits(keys, mBits) // resolve ONCE: build and probe
                                      // must share the same geometry
    bloomSemiJoinPacked(big, bigKey, keys, keyCol,
      broadcastPackedBits(keys, keyCol, m, k), m, k)
  }
}
