package graft.etl

import graft.SparkSpec
import graft.core.Tables

/** Pivot / rollup invariants on the sf0.001 tables. */
class CubeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("eventsPivot counts per type sum to the table total") {
    val events = Tables(spark, dir, "events")
    val out = Cube.eventsPivot(events,
      Seq("click", "error", "purchase", "signup", "view"))
    val cols = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
    val pivotTotal = out.collect()
      .map(r => cols.map(c => r.getAs[Long](c)).sum).sum
    assert(pivotTotal == events.count())
    // no distinct-collect job: explicit values means the plan is a
    // single aggregate, so building the frame launches no Spark job
    assert(out.columns.toSet == (cols :+ "user_id").toSet)
  }

  test("salesRollup levels re-aggregate consistently") {
    val out = Cube.salesRollup(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"),
      Tables(spark, dir, "region")).collect()
    val nations = out.filter(_.getAs[Long]("g_nation") == 0L)
    val regions = out.filter(r =>
      r.getAs[Long]("g_region") == 0L && r.getAs[Long]("g_nation") == 1L)
    val total = out.filter(_.getAs[Long]("g_region") == 1L)
    assert(total.length == 1)
    assert(nations.map(_.getAs[Long]("n_items")).sum ==
      total.head.getAs[Long]("n_items"))
    assert(regions.map(_.getAs[Long]("n_items")).sum ==
      total.head.getAs[Long]("n_items"))
    // revenue re-aggregation agrees to the cent across levels
    val natRev = BigDecimal(nations.map(_.getAs[Double]("revenue")).sum)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val totRev = BigDecimal(total.head.getAs[Double]("revenue"))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    assert((natRev - totRev).abs <= BigDecimal(0.01) * nations.length)
  }
}
