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
}
