package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin is row-identical to the plain semi-join (no false negatives)") {
    val orders = Tables(spark, sf(), "orders")
    val high = Tables(spark, sf(), "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val plain = orders.join(high.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_semi")
      .orderBy("o_orderkey").collect().toSeq
    val bloomed = BloomJoin.bloomSemiJoin(orders, "o_custkey", high, "c_custkey")
      .orderBy("o_orderkey").collect().toSeq
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("the pre-filter prunes most non-matching rows before the join") {
    val big = (1L to 10000L).map(k => (k, s"row$k")).toDF("k", "payload")
    val keys = Seq(5L, 500L, 5000L).toDF("id")
    val bits = BloomJoin.buildBits(keys, "id")
    val passed = big.filter(BloomJoin.mightContain(col("k"), bits)).count()
    // 3 true keys; fpp at m=16384, n=3, k=3 is ~0 — allow a generous margin
    assert(passed >= 3 && passed <= 50, s"bloom passed $passed of 10000")
  }

  test("buildBits is deterministic and engine-replayable (affine family, no JVM hash)") {
    val keys = Seq(1L, 2L, 3L).toDF("id")
    val a = BloomJoin.buildBits(keys, "id")
    val b = BloomJoin.buildBits(keys.repartition(3), "id")
    assert(a.toSeq == b.toSeq)
  }

  test("packed-broadcast semi-join is row-identical at mBits=2^20 with no filter literal in the plan") {
    val orders = Tables(spark, sf(), "orders")
    val high = Tables(spark, sf(), "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val plain = orders.join(high.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_semi")
      .orderBy("o_orderkey").collect().toSeq
    val packed = BloomJoin.bloomSemiJoinPacked(
      orders, "o_custkey", high, "c_custkey", mBits = 1 << 20)
    assert(packed.orderBy("o_orderkey").collect().toSeq == plain)
    assert(plain.nonEmpty)
    // the 2^20 bits must ride the broadcast, not the plan: a plan
    // string that embedded them would be ≥ mBits/64 literals long
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.length < 20000, s"plan string is ${plan.length} chars")
    assert(plan.contains("bloom_bits_contain"), plan)

    // AutoBits (the default): filter sized from the build-side count
    // at ~10 bits/key, row-identical to the explicit run; and the
    // sizing rule itself (clamped pow2 of 10n)
    assert(BloomJoin.regimeMBits(1) == 1 << 14)
    assert(BloomJoin.regimeMBits(100000) == 1 << 20)
    assert(BloomJoin.regimeMBits(1000000000L) == 1 << 30)
    val auto = BloomJoin.bloomSemiJoinPacked(
      orders, "o_custkey", high, "c_custkey")
    assert(auto.orderBy("o_orderkey").collect().toSeq == plain)
    // geometry mismatch between a prebuilt filter and the probe must
    // fail fast, never silently probe wrong positions
    val bc = BloomJoin.broadcastPackedBits(high, "c_custkey", 1 << 16)
    intercept[IllegalArgumentException](BloomJoin.bloomSemiJoinPacked(
      orders, "o_custkey", high, "c_custkey", bc, 1 << 20, 3))
    bc.unpersist()
    // sub-word geometries are unrepresentable: a 1-word array cannot
    // distinguish mBits=64 from mBits=32, so a mixed pairing (build 64
    // / probe 32) would pass any length compare yet probe wrong bit
    // positions — silent false negatives. Both sides reject < 64.
    intercept[IllegalArgumentException](
      BloomJoin.buildPackedBits(high, "c_custkey", 32))
    val bc64 = BloomJoin.broadcastPackedBits(high, "c_custkey", 64)
    intercept[IllegalArgumentException](BloomJoin.bloomSemiJoinPacked(
      orders, "o_custkey", high, "c_custkey", bc64, 32, 3))
    bc64.unpersist()
  }

  test("NULL build keys neither crash the build nor change the semi-join result") {
    val big = (1L to 100L).map(k => (k, s"row$k")).toDF("k", "payload")
    val keys = Seq(Some(5L), None, Some(50L), None).toDF("id")
    val plain = big.join(keys.na.drop.select(col("id").as("k")), Seq("k"), "left_semi")
      .orderBy("k").collect().toSeq
    assert(BloomJoin.bloomSemiJoin(big, "k", keys, "id")
      .orderBy("k").collect().toSeq == plain)
    assert(BloomJoin.bloomSemiJoinPacked(big, "k", keys, "id")
      .orderBy("k").collect().toSeq == plain)
    assert(plain.map(_.getLong(0)) == Seq(5L, 50L))
  }

  test("caller-owned broadcast filter survives reuse and explicit unpersist") {
    val big = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "grp")
    val keys = Seq(3L, 30L, 300L).toDF("id")
    val mBits = 1 << 16
    val bc = BloomJoin.broadcastPackedBits(keys, "id", mBits)
    val out = BloomJoin.bloomSemiJoinPacked(big, "k", keys, "id", bc, mBits, 3)
    // two actions over the same handle — the reuse the handle overload exists for
    assert(out.count() == 3)
    assert(out.orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(3L, 30L, 300L))
    bc.unpersist(blocking = true)
  }

  test("packed and literal membership tests agree on every probed key") {
    val keys = Seq(5L, 500L, 5000L).toDF("id")
    val mBits = 1 << 16
    val bits = BloomJoin.buildBits(keys, "id", mBits)
    val bc = spark.sparkContext.broadcast(
      BloomJoin.buildPackedBits(keys, "id", mBits))
    val probes = (0L until 20000L).toDF("k")
    val disagree = probes
      .select(col("k"), BloomJoin.mightContain(col("k"), bits).as("lit"),
        BloomJoin.mightContainPacked(col("k"), bc, mBits).as("bc"))
      .filter(col("lit") =!= col("bc")).count()
    assert(disagree == 0)
  }
}
