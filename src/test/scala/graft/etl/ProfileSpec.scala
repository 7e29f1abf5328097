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

  test("corrBy ENFORCES the exact long-product bound: inputs past 3e9 " +
       "fail loudly instead of silently wrapping 2^63") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 4e9 * 4e9 = 1.6e19 > 2^63 ≈ 9.2e18 — the per-row square would wrap
    val rows = Seq(("g", 4000000000L, 1L), ("g", 1L, 2L)).toDF("g", "x", "y")
    val ex = intercept[Exception] {
      Profile.corrBy(rows, "g", col("x"), col("y")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    // under ANSI (the default) the wrapping product itself throws at
    // scan time; under non-ANSI the maxabs guard catches it — either
    // way the failure is loud, never a silently corrupted statistic
    assert(messages(ex).exists(m => m.contains("long-product bound") ||
      m.contains("ARITHMETIC_OVERFLOW")),
      s"expected a loud failure, got: $ex")
    // inputs AT the bound still compute
    val ok = Profile.corrBy(
      Seq(("g", 3000000000L, 1L), ("g", 1L, 2L)).toDF("g", "x", "y"),
      "g", col("x"), col("y")).collect()
    assert(ok.length == 1)
  }
}
