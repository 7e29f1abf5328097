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

  test("maintainJoinView: applying the D-then-I feed to the stored view " +
       "== recompute under updates, deletes and inserts") {
    val a = Tables(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val b = Tables(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val view = a.join(b, Seq("o_custkey"))

    // CDC feed on A's key: status rewrite for %3 keys, delete %10
    // keys, one brand-new key re-using an existing customer
    val someCust = b.select("o_custkey").limit(1)
      .collect().head.getLong(0)
    val updates = a.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
    val deletes = a.filter(col("o_orderkey") % 10 === 0)
      .withColumn("seq", lit(3L)).withColumn("op", lit("D"))
    val insert = spark.range(1)
      .select(lit(-1L).as("o_orderkey"), lit(someCust).as("o_custkey"),
        lit("N").as("o_orderstatus"),
        lit(1L).as("seq"), lit("I").as("op"))
    val feed = updates.unionByName(deletes).unionByName(insert)

    val delta = Incremental.maintainJoinView(view, feed,
      b, Seq("o_orderkey"), Seq("o_custkey")).cache()
    try {
      // apply: drop retracted keys from the stored view, add the I rows
      val retractedKeys = delta.filter(col("op") === "D")
        .select("o_orderkey").distinct()
      val applied = view
        .join(retractedKeys, Seq("o_orderkey"), "left_anti")
        .unionByName(delta.filter(col("op") === "I").drop("op"))
      // recompute: A' = untouched A rows + compacted feed survivors
      val touched = feed.select("o_orderkey").distinct()
      val aNew = a.join(touched, Seq("o_orderkey"), "left_anti")
        .unionByName(Cdc.applyChanges(feed, Seq("o_orderkey")))
      val recomputed = aNew.join(b, Seq("o_custkey"))

      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("o_orderkey", "o_custkey", "o_orderstatus", "c_mktsegment")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .sorted.toSeq
      assert(canon(applied) == canon(recomputed),
        "applied D-then-I feed != recompute")
      // the feed really exercised all three op classes
      assert(delta.filter(col("op") === "D").limit(1).count() == 1)
      assert(delta.filter(col("op") === "I" && col("o_orderkey") === -1L)
        .count() == 1, "brand-new key missing from inserts")
    } finally delta.unpersist()
  }
}
