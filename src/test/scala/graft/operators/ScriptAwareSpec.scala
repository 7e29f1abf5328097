package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Script-aware tokenization ([[TextOps.segmentIfUnspaced]]): scripts
  * that don't delimit words with spaces (CJK, Thai, …) segment to
  * overlapping character trigrams, so the whitespace-token stack —
  * token counts, Gopher gate, MinHash shingle dedup, retrieval —
  * produces sane output instead of treating each doc as one giant
  * word. On space-delimited text the switch is the IDENTITY, which is
  * what keeps every existing SQL-oracle query hash-green (verified
  * empirically: zero trigger rows in the driver corpus at all SFs).
  */
class ScriptAwareSpec extends SparkSpec {
  import spark.implicits._

  // Han-script fixtures, zero spaces. B differs from A by a short
  // infix (near-dup); C shares no trigrams with A.
  private val hanA = "今天天气很好我们一起去公园散步看花然后回家吃饭休息一下再去买东西"
  private val hanB = "今天天气很好我们一起去公园散步看花然后回家吃饭休息一下再去逛市场"
  private val hanC = "机器学习模型训练需要大量高质量数据清洗流程必须严谨否则结果不可靠"
  private val english =
    "the quick brown fox jumps over the lazy dog and then runs far away home"

  test("segmentIfUnspaced: identity on spaced text, overlapping char " +
       "trigrams on unsegmented runs, pass-through under the run gate, " +
       "and MIXED-script docs segment exactly their unsegmented runs") {
    val mixed = s"the report quotes $hanA in the appendix"
    val got = Seq(english, hanA, "短文", mixed)
      .toDF("text")
      .select(TextOps.segmentIfUnspaced(col("text")).as("seg"))
      .collect().map(_.getString(0))
    assert(got(0) == english, "spaced text must pass through unchanged")
    val grams = got(1).split(" ")
    assert(grams.length == hanA.length - 2, "one trigram per char offset")
    assert(grams.forall(_.length == 3))
    assert(grams(0) == hanA.substring(0, 3) && grams(1) == hanA.substring(1, 4))
    assert(got(2) == "短文", "short text stays whole")
    // the mixed doc segments ONLY the CJK run — a whole-doc density
    // switch would have passed this doc through blind
    assert(got(3) == s"the report quotes ${got(1)} in the appendix",
      s"mixed doc mis-segmented: ${got(3)}")
  }

  test("the native SegmentUnspaced kernel matches the declarative HOF " +
       "reference on every edge, and keeps the scan inside " +
       "whole-stage codegen") {
    val fixtures = Seq(
      english, hanA, hanB, hanC, "短文", "",
      "x" * 24,            // at the run gate — passes through
      "x" * 25,            // one past: the 25-char run segments
      s"ok $hanA ok",      // mixed: only the long run segments
      "a  b   c",          // multi-space runs (empty chunks)
      "antidisestablishmentarianism", // 28-char latin run — segments
      "ab", "a b", " ",
      "𝒜𝒷𝒞𝒹𝒠" * 8)      // supplementary-plane chars (code-point grams)
    val df = fixtures.toDF("text")
    val both = df.select(
      TextOps.segmentIfUnspaced(col("text")).as("kernel"),
      TextOps.segmentIfUnspacedHof(col("text")).as("ref"))
      .collect()
    both.zip(fixtures).foreach { case (r, fx) =>
      assert(r.getString(0) == r.getString(1),
        s"kernel diverged from HOF reference on ${fx.take(30)}…: " +
          s"'${r.getString(0).take(60)}' vs '${r.getString(1).take(60)}'")
    }
    // the kernel must NOT knock the projection out of WSCG (the HOF
    // form does — that cost the text family 1.5-2x in the r8 sweep);
    // assert over a parquet scan (a local relation constant-folds)
    val scan = graft.core.Tables(spark, sf(), "documents")
    def wscgProject(plan: String): Boolean =
      plan.linesIterator.exists(l =>
        l.contains("Project") && l.trim.startsWith("*("))
    val kPlan = scan.select(TextOps.segmentIfUnspaced(col("text")))
      .queryExecution.executedPlan.toString
    assert(wscgProject(kPlan),
      s"segmentation fell out of whole-stage codegen:\n$kPlan")
    val hofPlan = scan.select(TextOps.segmentIfUnspacedHof(col("text")))
      .queryExecution.executedPlan.toString
    assert(!wscgProject(hofPlan),
      "the HOF reference unexpectedly codegens — if Spark gained HOF " +
        "codegen, the kernel split may be removable")
  }

  test("gate signals are sane on unsegmented docs: token count tracks " +
       "chars, avg_token_len = 3 (inside the Gopher window), and an " +
       "en-gate keeps English while excluding the CJK doc as 'und' — " +
       "not as 'one giant word'") {
    val docs = Seq((1L, english), (2L, hanA)).toDF("doc_id", "text")
    val sig = TextAnalysis.gateSignals(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(sig(2L).getAs[Long]("n_tokens") == hanA.length - 2,
      "CJK token count must track characters, not collapse to 1")
    assert(sig(2L).getAs[Double]("avg_token_len") == 3.0)
    assert(sig(2L).getAs[String]("predicted_lang") == "und")
    // the English doc's signals are untouched by the switch
    assert(sig(1L).getAs[Long]("n_tokens") ==
      english.split(" ").length.toLong)
    val kept = Corpus.gopherGate(docs, minScore = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L),
      s"en-gate must keep English and exclude the und CJK doc, kept $kept")
  }

  test("MinHash dedup sees unsegmented near-dups: the changed-suffix " +
       "pair surfaces with high Jaccard, the unrelated doc pairs with " +
       "nothing (without segmentation every doc is ONE shingle and " +
       "dedup is blind)") {
    val docs = Seq((1L, hanA), (2L, hanB), (3L, hanC), (4L, english))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, minJaccard = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the (hanA, hanB) near-dup pair, got $pairs")
    // and the shingle features really are trigram-grain
    val nSh = docs.filter($"doc_id" === 1L)
      .select(size(TextOps.shingles(col("text"), 3)).as("n"))
      .head().getInt(0)
    assert(nSh > 10, s"expected many trigram shingles, got $nSh")
  }

  test("span dedup sees unsegmented duplicated passages: the shared CJK " +
       "prefix is mined as a span in BOTH docs and excised from both " +
       "(without segmentation each doc is ONE token and passage mining " +
       "is blind)") {
    // hanA and hanB share a 28-char prefix -> 26 shared trigram tokens
    // -> 19 shared 8-gram positions: well past the span threshold
    val docs = Seq((1L, hanA), (2L, hanB), (3L, english))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs).collect()
    val byDoc = spans.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == Set(1L, 2L),
      s"expected spans in exactly the CJK pair, got ${byDoc.keySet}")
    assert(spans.forall(_.getAs[Long]("span_start") == 0L),
      "the shared passage is the common PREFIX")
    assert(spans.forall(_.getAs[Long]("span_tokens") >= 20L),
      s"span must cover the shared prefix's trigrams: ${spans.mkString})")
    val cleaned = Dedup.exciseSpans(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed"))).toMap
    assert(cleaned(1L)._2 >= 20L && cleaned(2L)._2 >= 20L,
      s"shared passage must be excised from both docs: $cleaned")
    // the English doc shares nothing and passes through verbatim
    assert(cleaned(3L) == (english, 0L))
    // survivors are the DIVERGENT tails (in segmented trigram space)
    assert(cleaned(1L)._1 != cleaned(2L)._1 &&
      cleaned(1L)._1.nonEmpty && cleaned(2L)._1.nonEmpty)
  }

  test("retrieval terms on unsegmented docs are trigrams: a 3-char query " +
       "term finds the doc containing it") {
    val docs = Seq((1L, hanA), (2L, hanC), (3L, english))
      .toDF("doc_id", "text")
    val q = Seq(1 -> Seq(hanA.substring(4, 7)), 2 -> Seq("fox"))
    val hits = Retrieval.keywordSearch(docs, q)
      .select(col("query_id").cast("long"), col("doc_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 1L), (2L, 3L)),
      s"trigram term must hit only the CJK doc containing it, got $hits")
  }
}
