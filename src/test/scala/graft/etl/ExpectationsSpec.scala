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

  test("keyCounts-composed unique + relationship equal the standalone " +
       "forms") {
    val fact = Seq((1L, 1), (1L, 2), (1L, 2), (2L, 1), (9L, 1))
      .toDF("fk", "ln")
    val dim = Seq(1L, 2L).toDF("pk")
    val kc = Expectations.keyCounts(fact, Seq("fk", "ln"))
    val composed = Expectations.report(Seq(
      Expectations.uniqueFromKeyCounts(kc, "t", Seq("fk", "ln")),
      Expectations.relationshipFromKeyCounts(kc, "t", "fk", dim, "pk")))
    val standalone = Expectations.report(Seq(
      Expectations.checkUnique(fact, "t", Seq("fk", "ln")),
      Expectations.checkRelationship(fact, "t", "fk", dim, "pk")))
    assert(composed.collect().map(_.toSeq).toSeq ===
      standalone.collect().map(_.toSeq).toSeq)
  }

  test("a PINNED keyCounts pass removes the per-consumer table scans " +
       "(the SparkEntry expectations_check composition)") {
    val orders = graft.core.Tables(spark, sf(), "orders")
    val kc = Expectations.keyCounts(orders, Seq("o_orderkey"))
      .localCheckpoint(false)
    val composed = Expectations.report(Seq(
      Expectations.uniqueFromKeyCounts(kc, "orders", Seq("o_orderkey")),
      Expectations.relationshipFromKeyCounts(kc, "orders", "o_orderkey",
        kc, "o_orderkey")))
    val rows = composed.collect()
    assert(rows.forall(_.getBoolean(3)), rows.mkString("\n"))
    // three consumers (unique, fk side, dim side) — zero parquet
    // scans in the executed plan: every branch reads the pinned RDD
    val full = composed.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    assert("Scan parquet".r.findAllIn(plan).isEmpty, plan)
    // and the standalone twin pays a parquet scan per check
    val standalone = Expectations.report(Seq(
      Expectations.checkUnique(orders, "orders", Seq("o_orderkey")),
      Expectations.checkRelationship(orders, "orders", "o_orderkey",
        orders, "o_orderkey")))
    standalone.collect()
    val fullS = standalone.queryExecution.executedPlan.toString
    val planS = fullS.indexOf("== Initial Plan ==") match {
      case -1 => fullS
      case i  => fullS.substring(0, i)
    }
    assert("Scan parquet".r.findAllIn(planS).size >= 2, planS)
  }

  test("relationshipFromKeyCounts drops NULL fks at key grain exactly " +
       "like the row-grain pre-filter") {
    val fact = Seq(Some(1L), Some(1L), Some(9L), None, None)
      .toDF("fk")
    val dim = Seq(1L, 2L).toDF("pk")
    val viaKc = Expectations.relationshipFromKeyCounts(
      Expectations.keyCounts(fact, Seq("fk")), "t", "fk", dim, "pk").head()
    val direct = Expectations.checkRelationship(
      fact, "t", "fk", dim, "pk").head()
    assert(viaKc.toSeq === direct.toSeq)
    assert((viaKc.getLong(1), viaKc.getLong(2)) === ((3L, 1L)))
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
