package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("native shingles match the declarative HOF reference on edge cases") {
    val df = Seq(
      "the quick brown fox jumps",
      "a b",                    // shorter than n
      "",                       // empty text
      "x y z",                  // exactly n
      "dup dup dup dup",        // repeated shingle collapses
      "a  b c d"                // double space -> empty token, Java split parity
    ).toDF("text")
    val rows = df.select(
      TextOps.shingles(col("text"), 3).as("native"),
      TextOps.shinglesHof(split(col("text"), " "), 3).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
  }

  test("keepDuplicates preserves every occurrence in position order") {
    val r = Seq("a b a b a").toDF("text")
      .select(GraftFunctions.wordShingles(col("text"), 2, keepDuplicates = true))
      .collect().head.getSeq[String](0)
    assert(r == Seq("a b", "b a", "a b", "b a"))
  }

  test("word_shingles is available in SQL after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT word_shingles('a b c d', 2) AS s").collect()
    assert(r.head.getSeq[String](0) == Seq("a b", "b c", "c d"))
  }

  test("null text yields null, non-string input is rejected") {
    val withNull = Seq(Option("a b c"), None).toDF("text")
    val rows = withNull
      .select(TextOps.shingles(col("text"), 2).as("s")).collect()
    assert(rows(0).getSeq[String](0) == Seq("a b", "b c"))
    assert(rows(1).isNullAt(0))
    val err = intercept[Exception] {
      Seq(1L).toDF("x")
        .select(GraftFunctions.wordShingles(col("x"), 2)).collect()
    }
    assert(err.getMessage.contains("word_shingles"))
  }
}
