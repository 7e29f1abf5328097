package graft.operators

import graft.SparkSpec
import graft.functions.{GraftFunctions, RollingFingerprint}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality computes exact token/char arithmetic") {
    val out = TextAnalysis.quality(Seq((1L, "the cat sat")).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Long]("n_chars") == 11L)
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[Double]("avg_token_len") == 3.0)
    assert(out.getAs[Double]("punct_ratio") == 0.0)
    assert(math.abs(out.getAs[Double]("stopword_ratio") - 1.0 / 3) < 1e-12)
  }

  test("tokenCount: ws vs bpe-ish vs subword estimate") {
    val out = TextAnalysis.tokenCount(
      Seq((1L, "abc 123 x.y")).toDF("doc_id", "text")).collect().head
    assert(out.getAs[Long]("ws_tokens") == 3L)
    // [abc][123][x][.][y]
    assert(out.getAs[Long]("bpe_tokens") == 5L)
    assert(out.getAs[Long]("subword_est") == 3L) // ceil(9/4)
  }

  test("langId scores markers with fixed-priority argmax") {
    val out = TextAnalysis.langId(Seq(
      (1L, "the cat of the house"),
      (2L, "el perro de la casa"),
      (3L, "xyz qqq")).toDF("doc_id", "text")).collect()
    assert(out.map(_.getAs[String]("predicted_lang")).toSeq ==
      Seq("en", "es", "und"))
  }

  test("bigramLift ranks the always-together pair above independent pairs") {
    // "x y" always co-occur (5 times, only with each other); filler
    // tokens pair broadly, so lift(x y) must rank top
    val docs = (1L to 5L).map(i =>
      (i, s"x y common$i filler filler x y " + ("the a of in " * 3).trim))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLift(docs, minCount = 5, k = 5).collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[String]("bigram") == "x y")
    val lifts = out.map(_.getAs[Double]("lift")).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("repetition: totals, distincts, dominance, short-doc zeros") {
    val out = TextAnalysis.repetition(Seq(
      (1L, "a b c a b c a b c"),   // 7 grams: abc(3) bca(2) cab(2)
      (2L, "one two three four"),  // 2 distinct grams, no repeats
      (3L, "x y")                  // shorter than n -> zeros
    ).toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("total_ngrams") == 7L)
    assert(out(1L).getAs[Long]("distinct_ngrams") == 3L)
    assert(out(1L).getAs[Long]("top_ngram_freq") == 3L)
    assert(out(1L).getAs[Double]("repetition_ratio") == math.rint((1.0 - 3.0 / 7) * 1e4) / 1e4)
    assert(out(2L).getAs[Long]("total_ngrams") == 2L)
    assert(out(2L).getAs[Double]("repetition_ratio") == 0.0)
    assert(out(3L).getAs[Long]("total_ngrams") == 0L)
    assert(out(3L).getAs[Double]("top_ngram_ratio") == 0.0)
  }

  test("rolling fingerprint: deterministic, content-sensitive, window-local") {
    val df = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789 the quick brown fox jumps"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789 the quick brown fox jumps"),
      (3L, "a completely different document body with other content here!"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(df, window = 16).collect()
    assert(out(0).getAs[Long]("fingerprint") == out(1).getAs[Long]("fingerprint"))
    assert(out(0).getAs[Long]("fingerprint") != out(2).getAs[Long]("fingerprint"))
    // matches the direct JVM evaluation (codegen path == interpreted path)
    val direct = RollingFingerprint.compute(
      "a completely different document body with other content here!"
        .getBytes("UTF-8"), 16)
    assert(out(2).getAs[Long]("fingerprint") == direct)
  }

  test("rolling_fingerprint is SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT rolling_fingerprint('hello world hello world', 8) AS f")
      .collect().head.getLong(0)
    assert(r == RollingFingerprint.compute(
      "hello world hello world".getBytes("UTF-8"), 8))
  }

  test("MarkerCounts kernel matches the per-language HOF reference " +
       "token-for-token (instances, split-on-single-space semantics)") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    def hofCount(toks: Column, words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast("long")
    val fixtures = Seq(
      "the cat and the dog", "", " ", "the  the", "el la unodoswords",
      "der und die das der", "le la et unknown", "no markers here at all",
      "今天天气很好我们一起去公园散步看花然后回家吃饭休息一下再去买东西")
    val df = fixtures.toDF("text")
    val seg = TextOps.segmentIfUnspaced(col("text"))
    val kernel = graft.functions.GraftFunctions
      .markerCounts(seg, TextAnalysis.Markers.map(_._2))
    val cols = TextAnalysis.Markers.indices.flatMap { i =>
      Seq(element_at(kernel, i + 1).as(s"k$i"),
        hofCount(split(seg, " "), TextAnalysis.Markers(i)._2).as(s"h$i"))
    }
    df.select(cols: _*).collect().foreach { r =>
      TextAnalysis.Markers.indices.foreach { i =>
        assert(r.getAs[Long](s"k$i") == r.getAs[Long](s"h$i").toLong,
          s"kernel diverged from HOF on lang $i: $r")
      }
    }
  }
}
