package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SegmentationSpec extends SparkSpec {

  test("rfm segments partition the customer base exactly") {
    val orders = Tables(spark, sf(), "orders")
    val seg = Segmentation.rfmSegments(orders).cache()
    try {
      val nCustomers = orders.select("o_custkey").distinct().count()
      assert(seg.agg(sum("n_customers")).head().getLong(0) === nCustomers)
      // bands stay in range and every quartile band is populated per metric
      Seq("r_band", "f_band", "m_band").foreach { b =>
        val bands = seg.groupBy(b).agg(sum("n_customers")).collect()
          .map(r => r.getLong(0)).sorted.toSeq
        assert(bands.forall(x => x >= 1 && x <= 4))
        assert(bands.size >= 3, s"$b collapsed to $bands")
      }
    } finally seg.unpersist()
  }

  test("value-based banding is stable under repartition (re-ingestion stability)") {
    val orders = Tables(spark, sf(), "orders")
    val a = Segmentation.rfmSegments(orders).collect().toSeq
    val b = Segmentation.rfmSegments(orders.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("skyline matches the quadratic dominance definition; ties and " +
       "equal-cost domination handled") {
    import spark.implicits._
    // deliberate cases: both-axis tie (1,10)x2 → both survive;
    // equal-cost smaller gain (1,9) dominated; strictly-cheaper
    // equal-gain (3,10) dominated by (1,10); frontier point (5,20);
    // interior (4,15) survives (cheaper than 5, better than 10)
    val rows = Seq(
      (1L, 1.0, 10), (2L, 1.0, 10), (3L, 1.0, 9),
      (4L, 3.0, 10), (5L, 4.0, 15), (6L, 5.0, 20), (7L, 6.0, 12))
      .toDF("id", "cost", "gain")
    val got = Segmentation.skyline(rows, "cost", "gain")
      .select("id").as[Long].collect().toSet
    val brute = rows.collect().filter { p =>
      !rows.collect().exists(q =>
        q.getDouble(1) <= p.getDouble(1) && q.getInt(2) >= p.getInt(2) &&
          (q.getDouble(1) < p.getDouble(1) || q.getInt(2) > p.getInt(2)))
    }.map(_.getLong(0)).toSet
    assert(got == brute && got == Set(1L, 2L, 5L, 6L), s"skyline $got")
    // layout independence (the bucketed prefix max is deterministic)
    val re = Segmentation.skyline(rows.repartition(5), "cost", "gain")
      .select("id").as[Long].collect().toSet
    assert(re == got)
  }
}
