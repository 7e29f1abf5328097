package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def words(ws: String*) = ws.toDF("item")

  test("estimate is an upper bound that is exact without collisions") {
    val items = words(Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma"): _*)
    val sketch = Sketches.cmsSketch(items)
    val est = Sketches.cmsEstimate(sketch, words("alpha", "beta", "gamma", "absent"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct items in 2048 buckets: no collisions, estimates exact
    assert(est("alpha") === 5L)
    assert(est("beta") === 3L)
    assert(est("gamma") === 1L)
    // never-inserted item maps to untouched cells → 0, not NULL-skipped
    assert(est("absent") === 0L)
  }

  test("merge of disjoint-slice sketches == one-pass sketch (cell-wise add)") {
    val a = words("x", "x", "y")
    val b = words("x", "z", "z")
    val merged = Sketches.cmsMerge(Sketches.cmsSketch(a), Sketches.cmsSketch(b))
      .cells.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val onePass = Sketches.cmsSketch(a.unionAll(b))
      .cells.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === onePass)
  }

  test("sketch size is bounded by depth*width however many distinct items") {
    val many = spark.range(10000).select(concat(lit("w"), col("id")).as("item"))
    val sketch = Sketches.cmsSketch(many, depth = 2, width = 64)
    assert(sketch.cells.count() <= 2L * 64)
    // mass conservation per row: each row's cells sum to N
    val rowSums = sketch.cells.groupBy("row").agg(sum("cnt").as("s"))
      .collect().map(_.getLong(1))
    assert(rowSums.toSeq === Seq(10000L, 10000L))
  }

  test("forced collisions (width 2) overestimate but never underestimate") {
    val items = words(Seq.fill(7)("aa") ++ Seq.fill(2)("bb") ++ Seq("cc"): _*)
    val sketch = Sketches.cmsSketch(items, depth = 2, width = 2)
    val est = Sketches.cmsEstimate(sketch, words("aa", "bb", "cc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("aa") >= 7L && est("bb") >= 2L && est("cc") >= 1L)
    assert(est.values.forall(_ <= 10L))
  }

  test("StringHash31 kernel matches the MinHashSig shingle-hash family") {
    // a 1-token document's 1-shingle minhash row 0 is (a0*x+b0) mod M —
    // recompute from the scalar kernel and compare
    val x = graft.functions.StringHash31.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
    val viaSig = graft.functions.MinHashSig.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello"), 1, 1)
    val expected = (graft.functions.MinHashSig.coeffA(0) * x +
      graft.functions.MinHashSig.coeffB(0)) % Sketches.Mod
    assert(viaSig.getInt(0).toLong === expected)
  }

  test("heavyHitters: top-k exact counts with est >= exact, ordered") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "a cat and a dog")).toDF("doc_id", "text")
    val hh = Sketches.heavyHitters(docs, k = 3).collect()
    assert(hh.map(_.getString(0)).toSeq === Seq("the", "a", "cat"))
    assert(hh.map(r => (r.getLong(1), r.getLong(2))).forall {
      case (exact, est) => est >= exact
    })
    assert(hh.head.getLong(1) === 3L)
  }

  // --- quantile sketch ---

  private def evFrame(n: Int) = {
    val rows = (1 to n).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", (i * 37 % 101).toDouble))
    rows.toDF("event_id", "event_type", "value")
  }

  test("quantileSketch: merge over ANY slicing == one-pass sketch " +
       "row-for-row (bottom-k under a total order is exactly mergeable)") {
    val ev = evFrame(5000)
    val g = Seq("event_type")
    val k = 64
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type", "__qh", "__qid").collect().toSeq
    val onePass = Sketches.quantileSketch(ev, g, col("value"), col("event_id"), k)
    // slice by id parity — an arbitrary partitioning of the rows
    val a = Sketches.quantileSketch(ev.filter($"event_id" % 2 === 0),
      g, col("value"), col("event_id"), k)
    val b = Sketches.quantileSketch(ev.filter($"event_id" % 2 =!= 0),
      g, col("value"), col("event_id"), k)
    assert(rows(Sketches.quantileMerge(g, k, a, b)) == rows(onePass),
      "merged sketch diverged from one-pass")
    // merge is idempotent: re-merging the merged sketch is a no-op
    val m = Sketches.quantileMerge(g, k, a, b)
    assert(rows(Sketches.quantileMerge(g, k, m)) == rows(m))
  }

  test("quantileSketch state is FIXED at k rows per group; estimates " +
       "track exact quantiles within the order-statistic bound") {
    val ev = evFrame(20000)
    val k = 256
    val sk = Sketches.quantileSketch(ev, Seq("event_type"),
      col("value"), col("event_id"), k)
    val sizes = sk.groupBy("event_type").count().collect()
      .map(_.getLong(1))
    assert(sizes.forall(_ == k), s"per-group state not fixed: ${sizes.toSeq}")
    val est = Sketches.quantileEstimate(sk, Seq("event_type"),
      Seq("p50" -> 0.5)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.35, 0.65))").as("band"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1)).toMap
    // 3.5·sqrt(.25/256) ≈ 0.11 quantile positions: p50 estimate must
    // sit inside the exact [p35, p65] band
    est.foreach { case (t, m) =>
      assert(m >= exact(t).head && m <= exact(t).last,
        s"sketch p50 for $t = $m outside exact [p35,p65] ${exact(t)}")
    }
  }

  test("quantileSketch plan bounds the shuffle: WindowGroupLimit on the " +
       "map side, no unpartitioned window") {
    val ev = evFrame(1000)
    val plan = Sketches.quantileSketch(ev, Seq("event_type"),
      col("value"), col("event_id")).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter not pushed to WindowGroupLimit:\n$plan")
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition"),
      plan)
  }
}
