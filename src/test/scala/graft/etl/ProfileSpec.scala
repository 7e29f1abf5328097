package graft.etl

import graft.SparkSpec
import graft.core.Tables

class ProfileSpec extends SparkSpec {

  test("approx profile (the 100 TB default) tracks the exact profile within rsd") {
    val cols = Seq("l_suppkey", "l_quantity", "l_discount", "l_returnflag")
    val li = Tables(spark, sf(), "lineitem")
    val exact = Profile.tableProfile(li, cols, exact = true).collect().head
    val approx = Profile.tableProfile(li, cols, exact = false, rsd = 0.05)
      .collect().head
    assert(approx.getAs[Long]("n_rows") === exact.getAs[Long]("n_rows"))
    cols.foreach { c =>
      assert(approx.getAs[Long](s"nulls_$c") === exact.getAs[Long](s"nulls_$c"))
      val e = exact.getAs[Long](s"distinct_$c").toDouble
      val a = approx.getAs[Long](s"distinct_$c").toDouble
      // HLL++ at rsd=0.05: allow 3 standard errors (and exactness for
      // tiny cardinalities, where HLL++ falls back to a sparse exact set)
      assert(math.abs(a - e) <= math.max(1.0, 3 * 0.05 * e),
        s"distinct_$c approx $a vs exact $e")
    }
  }

  test("approx profile plan has no Expand (single-pass partial aggregation)") {
    val cols = Seq("l_suppkey", "l_quantity", "l_discount", "l_returnflag")
    val li = Tables(spark, sf(), "lineitem")
    val approxPlan = Profile.tableProfile(li, cols)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    val exactPlan = Profile.tableProfile(li, cols, exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan) // the cost approx avoids
  }
}
