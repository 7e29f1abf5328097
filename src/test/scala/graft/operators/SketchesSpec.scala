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
}
