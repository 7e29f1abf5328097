package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract surface invariants that don't need a SparkSession.
  *
  * The driver records a WEAKER rows-only check for any `queries` entry
  * without a matching `oracleSql` — an easy silent downgrade when a
  * query lands without its oracle. Every query here is deliberately
  * SQL-expressible, so the full map must stay total, and orphan oracle
  * keys (a renamed query leaving its SQL behind) must not linger.
  */
class ContractSurfaceSpec extends AnyFunSuite {

  test("every contract query has a DuckDB oracle (no silent rows-only downgrades)") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle (driver downgrades them): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"orphan oracle keys (renamed or removed queries): ${(o -- q).toSeq.sorted}")
  }

  test("bench surface covers every contract query") {
    val missing = graft.SparkEntry.queries.keySet -- graft.SparkEntry.benchQueries.keySet
    assert(missing.isEmpty,
      s"contract queries absent from the bench surface: ${missing.toSeq.sorted}")
  }
}
