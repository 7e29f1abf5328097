package graft.operators

import graft.SparkSpec
import graft.core.Tables

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges follows the greedy most-frequent-pair rule exactly") {
    // "abab"×2 + "ab"×1: pair (a,b) has 5 instances, (b,a) has 2
    val merges = Bpe.trainMerges(Map("abab" -> 2L, "ab" -> 1L), k = 3)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    // and it stops once no pairs remain (k=3 requested, 2 possible)
  }

  test("ties break lexicographically, so training is deterministic") {
    // "xy" and "ab" both have pair count 1 — (a,b) must win
    val merges = Bpe.trainMerges(Map("xy" -> 1L, "ab" -> 1L), k = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("encode applies merges leftmost-first in training order") {
    val merges = Seq(("a", "b"), ("ab", "ab"))
    assert(Bpe.encode("ababab", merges) == Seq("abab", "ab"))
    assert(Bpe.encode("ba", merges) == Seq("b", "a"))
  }

  test("end-to-end training compresses the corpus monotonically") {
    val docs = Tables(spark, sf(), "documents").limit(100)
    val merges = Bpe.train(docs, k = 20)
    assert(merges.length == 20)
    // every trained merge must shorten the encoding of SOME word
    val words = Bpe.wordFreqs(docs).collect().map(_.getString(0))
    val lens = (0 to 20).map(i =>
      words.map(w => Bpe.encode(w, merges.take(i)).length.toLong).sum)
    lens.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"merge produced no compression: $lens")
    }
    // determinism across invocations
    assert(Bpe.train(docs, k = 20) == merges)
  }

  test("minCount caps the collected vocabulary and ignores rare noise words") {
    val docs = (Seq.fill(10)("big corpus word") ++ Seq("typo0 typo1 typo2"))
      .toDF("text")
    // minCount=2 drops the three once-seen typos before the collect
    val merges = Bpe.train(docs, k = 2, minCount = 2)
    // trained only on {big, corpus, word}×10 — the first merges must come
    // from those words, identical to training on the clean corpus alone
    val clean = Bpe.train(Seq.fill(10)("big corpus word").toDF("text"), k = 2)
    assert(merges == clean)
    // maxVocab keeps the highest-count words (deterministic cut)
    val capped = Bpe.train(docs, k = 1, minCount = 1, maxVocab = 3)
    assert(capped == clean.take(1))
  }

  test("word frequencies reduce the corpus before any merge runs") {
    val docs = Seq("a b a", "b a").toDF("text")
    val f = Bpe.wordFreqs(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("a" -> 3L, "b" -> 2L))
  }
}
