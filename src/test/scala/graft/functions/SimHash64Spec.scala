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
      val th = docs
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("h"))
      th.groupBy("doc_id").agg(
          sum(bitSign(col("h"), 0)).as("c0"),
          (1 until 64).map(b => sum(bitSign(col("h"), b)).as(s"c$b")): _*)
        .select(col("doc_id"),
          (0 until 64).map(b =>
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
