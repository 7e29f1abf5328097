package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction — the tokenizer-training
  * step of an LLM data pipeline.
  *
  * Scale shape: the ONLY corpus-scale work is [[wordFreqs]] — one
  * explode + hash aggregate that collapses 100 TB of text into a
  * word-frequency table bounded by the distinct-word vocabulary. The
  * merge loop then runs on that aggregate (the standard practice:
  * tokenizer trainers consume word counts, not raw text), because each
  * BPE round is a global argmax + rewrite — a driver-sized problem once
  * the corpus has been reduced, and an iteration that would otherwise
  * pay 2k distributed shuffles for k merges.
  */
object Bpe {

  /** Corpus → (word, count): the distributed reduction. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Greedy BPE merge training over word frequencies: `k` rounds of
    * "merge the most frequent adjacent symbol pair". Ties break on the
    * lexicographically smallest pair, so training is deterministic.
    */
  def trainMerges(freqs: Map[String, Long], k: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      freqs.map { case (w, c) => w.split("").toVector -> c }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 0 until k if !done) {
      val pairs = words.toSeq
        .flatMap { case (syms, c) =>
          syms.zip(syms.tail).map(p => p -> c)
        }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    merges.result()
  }

  /** Apply one merge rule everywhere in a symbol sequence, leftmost
    * first (the occurrence just merged cannot overlap the next).
    */
  private def mergeOnce(syms: Vector[String],
                        rule: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == rule._1 && syms(i + 1) == rule._2) {
        out += (rule._1 + rule._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode a word with a trained merge list (rules applied in training
    * order — the standard BPE encode).
    */
  def encode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.split("").toVector)(mergeOnce)

  /** End-to-end: train `k` merges from a document corpus.
    *
    * The driver collect is bounded two ways: words below `minCount`
    * are dropped (a web-scale corpus has billions of once-seen
    * "words" — typos, URLs, hex ids — that can't win a merge anyway),
    * and at most `maxVocab` surviving words are kept (highest count
    * first, ties broken lexicographically so the cut is deterministic).
    * So the collected table is ≤ maxVocab rows regardless of corpus
    * size — standard tokenizer-trainer practice.
    */
  def train(docs: DataFrame, k: Int, minCount: Long = 1,
            maxVocab: Int = 1000000): Seq[(String, String)] = {
    val freqs = wordFreqs(docs)
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    trainMerges(freqs, k)
  }
}
