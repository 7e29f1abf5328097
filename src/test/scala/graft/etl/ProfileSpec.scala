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

  test("histDrift: shifted distribution flags, identical does not, " +
    "one-sided group yields NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group "same": identical uniform spread in both snapshots;
    // group "shift": A low bins, B high bins; group "only_a": A only
    def rows(g: String, vs: Seq[Double], tag: String) =
      vs.map(v => (g, v, tag))
    val low = (1 to 200).map(i => (i % 100).toDouble)
    val high = (1 to 200).map(i => (i % 100).toDouble + 60.0)
    val a = (rows("same", low, "a") ++ rows("shift", low, "a")
      ++ rows("only_a", low, "a")).map { case (g, v, _) => (g, v) }
      .toDF("grp", "v")
    val b = (rows("same", low, "b") ++ rows("shift", high, "b"))
      .map { case (g, v, _) => (g, v) }.toDF("grp", "v")
    val out = Profile.histDrift(a, b, "v", "grp", Seq(10.0, 25.0, 50.0, 100.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toMap
    val (_, _, sameChi, sameDrift) = out("same")
    assert(sameChi.get.asInstanceOf[Double] === 0.0 && !sameDrift)
    val (_, _, shiftChi, shiftDrift) = out("shift")
    assert(shiftChi.get.asInstanceOf[Double] > 13.277 && shiftDrift)
    val (na, nb, onlyChi, onlyDrift) = out("only_a")
    assert(na === 200L && nb === 0L && onlyChi.isEmpty && !onlyDrift)
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

  test("corrBy: ±1 on perfectly (anti)correlated groups, NULL on zero variance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("pos", 1L, 10L), ("pos", 2L, 20L), ("pos", 3L, 30L),
      ("neg", 1L, 30L), ("neg", 2L, 20L), ("neg", 3L, 10L),
      ("flat", 5L, 1L), ("flat", 5L, 2L), ("flat", 5L, 3L))
      .toDF("g", "x", "y")
    val out = Profile.corrBy(rows, "g", col("x"), col("y")).collect()
      .map(r => r.getAs[String]("g") ->
        Option(r.getAs[java.lang.Double]("corr"))).toMap
    assert(out("pos").contains(1.0))
    assert(out("neg").contains(-1.0))
    assert(out("flat").isEmpty, "zero-variance group must be NULL")
  }
}
