package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native minhash signature is bit-identical to min(hash(shingle, i))") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "a b"),            // no 3-shingles -> null / dropped
      (4L, "x y z")           // exactly one shingle
    ).toDF("doc_id", "text")
    val k = 8
    val native = docs
      .select(col("doc_id"), GraftFunctions.minhashSig(col("text"), 3, k).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val declarative = docs
      .select(col("doc_id"),
        explode(graft.operators.TextOps.shinglesHof(split(col("text"), " "), 3)).as("s"))
      .groupBy("doc_id")
      .agg(min(hash(col("s"), lit(0))).as("mh0"),
        (1 until k).map(i => min(hash(col("s"), lit(i))).as(s"mh$i")): _*)
      .collect()
      .map(r => r.getLong(0) -> (0 until k).map(i => r.getInt(i + 1))).toMap
    assert(native.keySet == Set(1L, 2L, 4L))
    assert(native.view.mapValues(_.toSeq).toMap ==
      declarative.view.mapValues(_.toSeq).toMap)
  }
}
