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

  test("fuzzyNamePairs matches the quadratic levenshtein definition and " +
       "emits each unordered pair once") {
    import spark.implicits._
    // cold/old distance 1 (length band 1); cat/bat 1; cat/cart 1
    // (cross-length); ab/xy 2; short/very long name excluded by the
    // length band AND the distance; duplicate rows collapse at name
    // grain first
    val names = Seq("cold gear", "old gear", "cat", "bat", "cart",
      "ab", "xy", "a much longer name", "cold gear", "bat")
    val df = names.toDF("n")
    val got = Segmentation.fuzzyNamePairs(df, "n", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // quadratic truth over distinct names
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val distinct = names.distinct
    val want = (for {
      a <- distinct; b <- distinct if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got.toSet == want, s"pairs ${got.toSet} != $want")
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    assert(want.contains(("bat", "cat", 1L)) &&
      want.contains(("cart", "cat", 1L)) && want.contains(("ab", "xy", 2L)))
  }

  test("resolveEntities collapses transitive fuzzy chains to the " +
       "min-key canonical; singletons label themselves") {
    import spark.implicits._
    // chain: cat—bat—bad (cat~bat 1, bat~bad 1, cat~bad 2) one entity;
    // dog isolated
    val rows = Seq((10L, "cat"), (20L, "bat"), (30L, "bad"), (40L, "dog"),
      (50L, "cat"))
    val df = rows.toDF("k", "n")
    val out = Segmentation.resolveEntities(df, "n", "k", maxDist = 1)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("entity_id"), r.getAs[String]("canonical"))).toMap
    assert(out("cat") == ((10L, "cat")) && out("bat") == ((10L, "cat")) &&
      out("bad") == ((10L, "cat")), s"chain did not collapse: $out")
    assert(out("dog") == ((40L, "dog")), s"singleton mislabeled: $out")
  }
}
