package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  test("native simhash matches the declarative explode+groupBy formulation") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),        // identical -> identical sig
      (3L, "a completely different doc"),
      (4L, ""),                           // one empty token
      (5L, "dup dup dup")                 // distinct collapses to one token
    ).toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
      GraftFunctions.simhash64(col("text")).as("sig"))
    val declarative = {
      def bitSign(h: org.apache.spark.sql.Column, b: Int) =
        when(call_function("shiftright", h, lit(b)).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)
      // Horner polynomial hash over the token's chars (ascii corpus:
      // char code == utf-8 byte), declared via the aggregate lambda —
      // the independent formulation of SimHash64.polyHash.
      def poly(t: org.apache.spark.sql.Column, base: Long,
               s1: Int, s2: Int, s3: Int) = {
        import org.apache.spark.sql.Column
        val h = aggregate(split(t, ""), lit(0L),
          (acc, c) => (acc * base + ascii(c)) % SimHash64.Mod)
        def xsr(x: Column, s: Int) =
          x.bitwiseXOR(call_function("shiftright", x, lit(s)))
        def mul(x: Column, c: Long) = (x * c).bitwiseAND(lit(SimHash64.Mask))
        xsr(mul(xsr(mul(xsr(h, s1), SimHash64.MixC1), s2), SimHash64.MixC2), s3)
      }
      val tk = split(col("text"), " ")
      val feats = when(size(tk) < 3, array(col("text")))
        .otherwise(graft.operators.TextOps.shinglesHof(tk, 3))
      val th = docs
        .select(col("doc_id"), explode(feats).as("t"))
        .select(col("doc_id"),
          poly(col("t"), SimHash64.BaseA, 16, 13, 16).as("h1"),
          poly(col("t"), SimHash64.BaseB, 15, 14, 15).as("h2"))
      th.groupBy("doc_id").agg(
          sum(bitSign(col("h1"), 0)).as("c0"),
          ((1 until 31).map(b => sum(bitSign(col("h1"), b)).as(s"c$b")) ++
            (0 until 31).map(b =>
              sum(bitSign(col("h2"), b)).as(s"c${31 + b}"))): _*)
        .select(col("doc_id"),
          (0 until 62).map(b =>
            when(col(s"c$b") > 0, lit(1L << b)).otherwise(0L))
            .reduce(_.bitwiseOR(_)).as("sig"))
    }
    val n = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = declarative.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == d)
    assert(n(1L) == n(2L))
    assert(n(1L) != n(3L))
  }

  test("simhash64 is available in SQL after register()") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT simhash64('a b c') AS s").collect().head.getLong(0)
    val viaCol = Seq("a b c").toDF("t")
      .select(GraftFunctions.simhash64(col("t"))).collect().head.getLong(0)
    assert(viaSql == viaCol)
  }
}
