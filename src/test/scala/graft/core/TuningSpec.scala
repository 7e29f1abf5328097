package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-aware shuffle sizing rule (VERDICT r12 #3: a
  * constant 32 partitions at sf10's 60M-row lineitem packed ~2M rows
  * per partition and nondeterministically killed the JVM).
  */
class TuningSpec extends AnyFunSuite {

  test("shuffle width floors at the core count through sf1") {
    // sf0.1 (600k) and sf1 (6M: needs 24 < 32) keep the historical 32
    assert(Tuning.shufflePartitions(600000L, 32) == 32)
    assert(Tuning.shufflePartitions(6000000L, 32) == 32)
    // empty/missing fact table: the floor, never zero
    assert(Tuning.shufflePartitions(0L, 16) == 16)
  }

  test("shuffle width scales with rows past the floor: sf10 gets ~240") {
    // 60M rows / 250k target = 240 — ~250k rows/partition, the regime
    // the r12 incident showed 32 could not hold
    assert(Tuning.shufflePartitions(60000000L, 32) == 240)
    // ceil, not floor: one row over a boundary adds a partition
    assert(Tuning.shufflePartitions(
      Tuning.TargetRowsPerPartition * 100 + 1, 32) == 101)
  }

  test("shuffle width caps at MaxPartitions on a single JVM") {
    assert(Tuning.shufflePartitions(600000000L, 32) == Tuning.MaxPartitions)
    assert(Tuning.shufflePartitions(Long.MaxValue / 2, 32) ==
      Tuning.MaxPartitions)
  }
}
