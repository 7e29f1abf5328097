package graft.etl

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("joinDelta: view ∪ delta == full recompute when BOTH sides take " +
       "inserts (ΔA×B_old, A_old×ΔB and ΔA×ΔB each counted once)") {
    // deterministic two-sided insert split on the real tables:
    // new orders = last date range; new customers = custkey % 10 == 0
    val orders = Tables(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val customer = Tables(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val aOld = orders.filter(col("o_orderdate") < "1998-06-01")
    val aDelta = orders.filter(col("o_orderdate") >= "1998-06-01")
    val bOld = customer.filter(col("o_custkey") % 10 =!= 0)
    val bDelta = customer.filter(col("o_custkey") % 10 === 0)
    assert(aDelta.limit(1).count() == 1 && bDelta.limit(1).count() == 1,
      "degenerate split: a delta side is empty")

    val viewOld = aOld.join(bOld, Seq("o_custkey"))
    val maintained = viewOld.unionByName(
      Incremental.joinDelta(aOld, aDelta, bOld, bDelta, Seq("o_custkey")))
    val recomputed = orders.join(customer, Seq("o_custkey"))

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("o_custkey", "o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val m = canon(maintained)
    assert(m == canon(recomputed), "maintained view != recompute")
    assert(m.size == m.distinct.size, "a match class was double-counted")
  }
}
