package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def report =
    Expectations.report(Seq(
      Expectations.checkRows(
        Seq((1L, Some("O"), 5.0), (2L, None, -1.0), (3L, Some("X"), 0.5))
          .toDF("k", "status", "price"),
        "t", Seq(
          Expectations.notNull("status"),
          Expectations.acceptedValues("status", Seq("O", "F")),
          Expectations.inRange("price", 0.0, 10.0),
          Expectations.satisfies("price_positive", col("price") > 0))),
      Expectations.checkUnique(
        Seq(1L, 1L, 1L, 2L, 3L).toDF("k"), "t", Seq("k")),
      Expectations.checkRelationship(
        Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk"), "t", "fk",
        Seq(1L, 2L).toDF("pk"), "pk")))

  test("row rules: one scan, per-rule violation counts") {
    val rows = report.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // status NULL once
    assert(rows("t.status.not_null") === ((3L, 1L, false)))
    // 'X' violates; NULL does not (dbt accepted_values semantics)
    assert(rows("t.status.accepted_values") === ((3L, 1L, false)))
    // -1.0 below range
    assert(rows("t.price.in_range") === ((3L, 1L, false)))
    // -1.0 fails the predicate
    assert(rows("t.price_positive.satisfies") === ((3L, 1L, false)))
  }

  test("unique counts keys (not rows): 3 keys, 1 duplicated") {
    val r = report.filter(col("rule") === "t.k.unique").head()
    assert((r.getLong(1), r.getLong(2)) === ((3L, 1L)))
  }

  test("relationship counts orphan ROWS over non-null FKs only") {
    val r = report.filter(col("rule") === "t.fk.relationship").head()
    // 3 non-null fk rows checked; the single 9L row is the orphan
    assert((r.getLong(1), r.getLong(2)) === ((3L, 1L)))
  }

  test("a clean suite passes everywhere") {
    val clean = Expectations.report(Seq(
      Expectations.checkRows(Seq((1L, "O")).toDF("k", "s"), "t",
        Seq(Expectations.notNull("s"))),
      Expectations.checkUnique(Seq(1L, 2L).toDF("k"), "t", Seq("k"))))
    assert(clean.collect().forall(_.getBoolean(3)))
  }

  test("checkRows is a single scan of the table (no joins, no window)") {
    val df = graft.core.Tables(spark, sf(), "orders")
    val rep = Expectations.checkRows(df, "orders", Seq(
      Expectations.notNull("o_custkey"),
      Expectations.inRange("o_totalprice", 0.0, 1e9)))
    rep.collect()
    // AdaptiveSparkPlan.toString prints final + initial plan; keep the
    // final section or every node counts twice
    val full = rep.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected 1 scan, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }
}
