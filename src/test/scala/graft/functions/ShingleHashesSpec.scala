package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "a b",                    // shorter than n=3 tokens → empty
    "",                       // single empty token
    "x x x x x",              // repeated shingle → one distinct
    "päivää maailma hyvää päivää maailma") // multibyte UTF-8

  test("hash array = hash64 of each distinct string shingle, sorted") {
    val df = texts.toDF("text")
    val rows = df.select(
      TextOps.shingles(col("text"), 3).as("sh"),
      TextOps.shingleHashes(col("text"), 3).as("hs")).collect()
    rows.foreach { r =>
      val strings = r.getSeq[String](0)
      val hashes = r.getSeq[Long](1)
      val expected = strings.map(ShingleHashes.hash64).distinct.sorted
      assert(hashes == expected)
      assert(hashes == hashes.sorted && hashes.distinct == hashes)
    }
    // short doc: empty array (matches WordShingles), not null
    assert(rows(2).getSeq[Long](1).isEmpty)
  }

  test("values are BIGINT-safe and oracle-replayable: (mixA<<31)|mixB") {
    val h = ShingleHashes.hash64("the quick brown")
    val bytes = "the quick brown".getBytes("UTF-8")
    val h1 = SimHash64.mix(SimHash64.polyHash(bytes, SimHash64.BaseA), 16, 13, 16)
    val h2 = SimHash64.mix(SimHash64.polyHash(bytes, SimHash64.BaseB), 15, 14, 15)
    assert(h == ((h1 << 31) | h2))
    assert(h >= 0 && h < (1L << 62))
  }

  test("sortedArrayJaccard equals the string-set jaccard on real pairs") {
    val df = texts.toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("sh"),
        TextOps.shingleHashes(col("text"), 3).as("hs"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(
        // try_divide: under ANSI (the Spark 4 default) a plain 0/0 on
        // the two-empty-docs pair throws instead of yielding null
        try_divide(
          size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"),
          size(array_union(col("a.sh"), col("b.sh")))).as("j_str"),
        GraftFunctions.sortedArrayJaccard(col("a.hs"), col("b.hs")).as("j_hash"))
      .collect()
    pairs.foreach { r =>
      val (s, h) = (Option(r.get(0)), Option(r.get(1)))
      assert(s == h, s"string jaccard $s != hash jaccard $h")
    }
    // the two-empty-arrays case produced at least one null-on-both pair
    assert(pairs.exists(_.isNullAt(1)))
  }

  test("two jaccard calls compile in one codegen scope (non-nullable inputs)") {
    // ADVICE r14: with non-nullable inputs nullSafeCodeGen inlines the
    // generated block unbraced, so a fixed-name local would be
    // redeclared and janino would reject the projection (silent
    // interpreted fallback). Two calls over array(lit...) columns
    // (non-nullable) in ONE select pin the freshName fix.
    val df = spark.range(3).select(
      array(lit(1L), lit(2L), lit(3L)).as("a"),
      array(lit(2L), lit(3L), lit(4L)).as("b"),
      array(lit(1L), lit(9L)).as("c"))
    val out = df.select(
      GraftFunctions.sortedArrayJaccard(col("a"), col("b")).as("j1"),
      GraftFunctions.sortedArrayJaccard(col("a"), col("c")).as("j2"))
      .collect()
    assert(out.forall(r => r.getDouble(0) == 0.5 && r.getDouble(1) == 0.25))
  }

  test("merge walk matches a set computation on adversarial arrays") {
    val cases = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (Array(Long.MaxValue - 1), Array(Long.MaxValue - 1, Long.MaxValue)))
    val df = cases.toDF("a", "b")
      .select(GraftFunctions.sortedArrayJaccard(col("a"), col("b")).as("j"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val want = cases.map { case (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val u = (sa ++ sb).size
      if (u == 0) None else Some(sa.intersect(sb).size.toDouble / u)
    }
    assert(got.toSeq == want)
  }
}
