package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup clusters identical texts, keeper = min doc_id") {
    val out = Dedup.exact(docs(
      1L -> "a b c", 2L -> "a b c", 3L -> "x y z")).collect()
    assert(out.length == 2)
    val cluster = out.find(_.getAs[Long]("n_dupes") == 2L).get
    assert(cluster.getAs[Long]("keeper_doc_id") == 1L)
  }

  test("ngramJaccard finds identical and near-identical docs only") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (1 to 30).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
    val out = Dedup.ngramJaccard(docs(
      1L -> base, 2L -> base, 3L -> near, 4L -> "totally different words here now"),
      minJaccard = 0.5).collect()
    val pairs = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical: jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // one-word edit
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val j12 = out.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L).get.getAs[Double]("jaccard")
    assert(j12 == 1.0)
  }

  test("minhashLsh finds high-jaccard pairs and verifies exactly") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok40", "other")
    val out = Dedup.minhashLsh(docs(
      10L -> base, 20L -> near, 30L -> "nothing in common at all whatsoever"))
      .collect()
    val pairs = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((10L, 20L)))
    assert(out.head.getAs[Double]("jaccard") > 0.8)
  }

  test("simhash: identical docs collide at hamming 0; disjoint docs do not pair") {
    val t = (1 to 50).map(i => s"word$i").mkString(" ")
    val out = Dedup.simhash(docs(1L -> t, 2L -> t,
      3L -> (51 to 120).map(i => s"zz$i").mkString(" "))).collect()
    val p = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Int]("hamming"))).toSet
    assert(p.exists(x => x._1 == 1L && x._2 == 2L && x._3 == 0))
    assert(!p.exists(x => x._2 == 3L))
  }
}
