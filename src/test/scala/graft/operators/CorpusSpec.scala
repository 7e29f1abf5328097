package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus pipelines: deterministic split, quality gate, components. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("trainTestSplit is deterministic and covers every doc exactly once") {
    val docs = (1L to 200L).map(i => (i, s"doc $i " + ("tok " * (i % 150).toInt)))
      .toDF("doc_id", "text")
    val a = Corpus.trainTestSplit(docs).collect()
    val b = Corpus.trainTestSplit(docs).collect()
    assert(a.toSeq == b.toSeq) // content-hash split: stable across runs
    assert(a.map(_.getAs[Long]("n_docs")).sum == 200L)
    val bySplit = a.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    // 13/16 expected train share; loose bounds for a 200-doc sample
    assert(bySplit("train") > bySplit("test"))
  }

  test("qualityFilter keeps only en keeper docs above the score floor") {
    val en = "the cat and the dog of the house went to the park and the end"
    val docs = Seq(
      (1L, en),              // keeper, en, decent score
      (2L, en),              // exact dup of 1 -> dropped
      (3L, "zz!! ##")        // junk -> dropped
    ).toDF("doc_id", "text")
    val out = Corpus.qualityFilter(docs, minScore = 0.3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(out.head.getAs[String]("predicted_lang") == "en")
  }

  test("decontaminate == brute-force 8-gram containment against test set") {
    val docs = graft.core.Tables(spark, sf(), "documents")
    val clean = Corpus.decontaminate(docs).collect().map(_.getLong(0)).toSet
    // independent brute force: recompute split + gram sets driver-side
    val h = ascii(substring(md5(col("text")), 32, 1))
    val nibble = when(h <= 57, h - 48).otherwise(h - 87)
    val rows = docs.select(col("doc_id"), (nibble < 13).as("is_train"),
        TextOps.shingles(col("text"), 8).as("g")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_train"),
        r.getAs[Seq[String]]("g").toSet))
    val testGrams = rows.filter(!_._2).flatMap(_._3).toSet
    val expected = rows.filter(_._2)
      .filter(_._3.intersect(testGrams).isEmpty).map(_._1).toSet
    assert(clean == expected && clean.nonEmpty)
    assert(clean.size < rows.count(_._2)) // something was contaminated
  }

  test("chunk covers every token with the declared size/stride geometry") {
    val docs = Seq((1L, (1 to 95).map(i => s"t$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val out = Corpus.chunk(docs, chunkSize = 50, stride = 40).collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // 95 tokens → starts 0, 40, 80 → sizes 50, 50, 15
    assert(d1.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 50L), (1L, 50L), (2L, 15L)))
    assert(d1.head.getString(3).startsWith("t1 t2 ") &&
      d1.last.getString(3) == (81 to 95).map(i => s"t$i").mkString(" "))
    // overlap: chunk 1 begins at token 41
    assert(d1(1).getString(3).startsWith("t41 "))
    // short doc → one whole-doc chunk
    assert(out.filter(_.getLong(0) == 2L).map(r =>
      (r.getLong(1), r.getLong(2), r.getString(3))).toSeq == Seq((0L, 3L, "a b c")))
  }

  test("sourceOverlap counts DISTINCT shared grams once per source pair") {
    val docs = Seq(
      (1L, "the cat sat here", "A"),
      (2L, "the cat ran away", "B"),
      (3L, "dogs bark loud now", "C"),
      (4L, "the cat naps", "A")). // A's duplicate "the cat" counts once
      toDF("doc_id", "text", "source")
    val out = Corpus.sourceOverlap(docs, n = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("A", "B") -> 1L)) // only "the cat"; C shares nothing
  }

  test("cdcChunks: boundaries re-sync after an insertion (the CDC property)") {
    val base = (1 to 200).map(i => s"w${i * 37 % 211}").mkString(" ")
    val edited = "inserted token burst " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val out = Corpus.cdcChunks(docs).collect()
    val byDoc = out.groupBy(_.getLong(0))
    // the property is only exercised if the doc actually splits
    assert(byDoc(1L).length >= 3,
      s"degenerate test: only ${byDoc(1L).length} chunks")
    val c1 = byDoc(1L).map(_.getAs[String]("chunk_text")).toSet
    val c2 = byDoc(2L).map(_.getAs[String]("chunk_text")).toSet
    // every chunk of the original except (at most) the prefix chunk
    // survives the insertion — fixed-stride chunking shares ~nothing
    val shared = c1.intersect(c2)
    assert(shared.size >= c1.size - 1,
      s"CDC failed to re-sync: ${c1.size} original, ${shared.size} shared")
    // the sharing count marks exactly those chunks as cross-doc
    out.filter(r => shared.contains(r.getAs[String]("chunk_text")))
      .foreach(r => assert(r.getAs[Long]("n_docs_sharing") === 2L))
    // chunks tile each doc: token counts sum to doc length, ids dense
    val d1 = byDoc(1L).sortBy(_.getAs[Long]("chunk_id"))
    assert(d1.map(_.getAs[Long]("n_chunk_tokens")).sum === 200L)
    assert(d1.map(_.getAs[Long]("chunk_id")).toSeq === d1.indices.map(_.toLong))
    // reassembly preserves token order
    assert(d1.map(_.getAs[String]("chunk_text")).mkString(" ") === base)
  }

  test("paragraphDedup charges duplicate chunks to later occurrences only") {
    // doc 1 and doc 3 are identical single-chunk texts; doc 2 is unique
    val docs = Seq((1L, "x y z"), (2L, "p q"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = Corpus.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((1L, 0L, 0.0))) // first occurrence owns the chunk
    assert(out(2L) == ((1L, 0L, 0.0)))
    assert(out(3L) == ((1L, 1L, 1.0))) // later identical doc is all-dup
  }

  test("noveltyScore counts corpus-rare bigram instances per doc") {
    // "x y" appears 3 times across docs (support 3 > 2); every other
    // bigram is unique (support 1 ≤ 2)
    val docs = Seq((1L, "x y p q"), (2L, "x y r"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = Corpus.noveltyScore(docs, rareMax = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 2L, 0.6667))) // x-y common; y-p, p-q rare
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("gopherGate applies every rule; gateWithLm composes the perplexity " +
       "cut on top") {
    val fluent = "the quick cat sat near the tall tree and " +
      "the small dog ran to the old house with joy"
    // passes every Gopher rule EXCEPT language (no en marker beats es)
    val spanish = "el gato la casa de los perros que corren el sol " +
      "la luna los vientos de la tarde que pasa"
    // passes lang/quality but degenerately repetitive: one 3-gram loop
    val loop = Seq.fill(10)("the cat sat").mkString(" ")
    val short = "the a of"
    val gated = Corpus.gopherGate(Seq(
      1L -> fluent, 2L -> spanish, 3L -> loop, 4L -> short)
      .toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(gated == Set(1L), s"gated $gated")

    // LM trained on the fluent doc's grams: a same-register doc scores
    // low, an unseen-vocabulary doc pays the smoothing floor — the
    // midpoint threshold keeps exactly the in-register one
    val ref = Seq(10L -> fluent, 11L -> fluent).toDF("doc_id", "text")
    val lm = TextAnalysis.ngramCounts(ref, 3, minCount = 1)
    val inRegister = 20L -> ("the quick cat sat near the tall tree and " +
      "the small dog ran to the old barn with glee")
    val offRegister = 21L -> ("yon zephyr vex gnarly quokka jumbo flax " +
      "wyvern the prism and oxbow kudzu to the vino plume and brine dew")
    val docs = Seq(inRegister, offRegister).toDF("doc_id", "text")
    assert(Corpus.gopherGate(docs).count() == 2, "fixture must pass the gate")
    val scores = TextAnalysis.lmScore(docs, lm).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_score")).toMap
    assert(scores(20L) < scores(21L), s"scores $scores")
    val mid = (scores(20L) + scores(21L)) / 2
    val kept = Corpus.gateWithLm(docs, lm, maxLmScore = mid)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(20L), s"kept $kept")
  }

  test("decontaminateProbe drops exactly the batch docs sharing a benchmark " +
       "gram, keeps full rows, and never rescans the held-out corpus") {
    val bench = Seq(
      100L -> (1 to 12).map(i => s"b$i").mkString(" "),
      101L -> (1 to 12).map(i => s"c$i").mkString(" "))
      .toDF("doc_id", "text")
    val grams = Corpus.benchmarkGrams(bench)
    val batch = Seq(
      (Option(1L), "x1 x2 " + (3 to 10).map(i => s"b$i").mkString(" ") + " x3", "web"),
      (Option(2L), (1 to 12).map(i => s"f$i").mkString(" "), "web"),
      (Option(3L), "y1 " + (2 to 9).map(i => s"c$i").mkString(" ") + " y2 y3", "books"),
      (Option(4L), (1 to 7).map(i => s"b$i").mkString(" "), "short"), // 7 < n: no gram
      (None: Option[Long], (1 to 12).map(i => s"b$i").mkString(" "), "anon"))
      .toDF("doc_id", "text", "source")
    val kept = Corpus.decontaminateProbe(batch, grams).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"))).toSet
    // docs 1 and 3 embed a full benchmark 8-gram → dropped; doc 2 is
    // clean; doc 4 shares words but no complete 8-gram → kept, with
    // every batch column intact; the NULL-id row carries a verbatim
    // benchmark passage and MUST be dropped — an unidentified doc
    // cannot ride the never-matching anti-join into the training set
    assert(kept == Set((2L, "web"), (4L, "short")), s"kept $kept")
  }

  test("connectedComponents labels every member with the component min") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("doc_a", "doc_b")
    val out = Corpus.connectedComponents(pairs, "doc_a", "doc_b").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on a long chain (diameter > 1 round)") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Corpus.connectedComponents(chain, "doc_a", "doc_b").collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[Long]("component_id") == 1L))
  }

  test("connectedComponents converges on a 500-node chain within the " +
       "round cap (pointer jumping — sf0.1 semdedup regression)") {
    // Plain min-propagation needs ~500 rounds here; pointer jumping
    // must close it in ≤ the default maxIters. Descending ids make the
    // min sit at the FAR end of the chain from the seed direction.
    // localThreshold=0 forces the distributed loop (a 500-edge graph
    // would otherwise take the union-find fast path).
    val n = 500L
    val chain = (1L until n).map(i => (n - i + 1, n - i)).toDF("doc_a", "doc_b")
    val out = Corpus
      .connectedComponents(chain, "doc_a", "doc_b", localThreshold = 0L)
      .collect()
    assert(out.length == n)
    assert(out.forall(_.getAs[Long]("component_id") == 1L))
  }

  test("connectedComponents routes non-integral ids to the iterative path") {
    // string ids: the union-find fast path only handles integral
    // types, so even a tiny graph must take the distributed loop —
    // and still label with the component min
    val pairs = Seq(("b", "a"), ("c", "b"), ("x", "y")).toDF("doc_a", "doc_b")
    val out = Corpus.connectedComponents(pairs, "doc_a", "doc_b").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("union-find fast path and iterative path produce identical labelings") {
    // a mix of chains, stars, merged clusters and singleton pairs
    val edges = Seq(
      (7L, 3L), (3L, 9L), (9L, 11L),          // chain with interior min
      (20L, 21L), (20L, 22L), (20L, 23L),      // star
      (21L, 3L),                               // merge star into chain
      (40L, 41L),                              // isolated pair
      (50L, 51L), (51L, 52L), (50L, 52L))      // triangle
      .toDF("doc_a", "doc_b")
    val fast = Corpus.connectedComponents(edges, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val iter = Corpus
      .connectedComponents(edges, "doc_a", "doc_b", localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(fast.sameElements(iter))
    assert(fast.toMap.apply(22L) == 3L)
  }

  test("cvFolds: complete partition, folds in range, layout-independent") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = Corpus.cvFolds(docs, k = 5).collect()
    assert(out.map(_.getAs[Long]("fold")).toSet.subsetOf((0L until 5L).toSet))
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "folds must partition the corpus exactly")
    // content-keyed: any repartition/reshuffle yields the same profile
    val re = Corpus.cvFolds(docs.repartition(7), k = 5).collect()
    assert(out.map(_.toSeq).toSet == re.map(_.toSeq).toSet)
  }

  test("gopherGateKeep preserves rows and columns; doc_ids match gopherGate") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("extra", org.apache.spark.sql.functions.lit("carried"))
    val keep = Corpus.gopherGateKeep(docs)
    assert(keep.columns.toSeq == docs.columns.toSeq,
      "row-preserving gate must emit exactly the input columns")
    val keptIds = keep.select("doc_id").as[Long].collect().toSet
    val gateIds = Corpus.gopherGate(docs.drop("extra"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == gateIds, "composed and standalone gates diverged")
  }

  test("gopherGateKeep gates rows with no identity (NULL doc_id)") {
    val docs = Seq[(Option[Long], String)](
      (None, "the quick brown fox jumps over a lazy dog of winter and " +
        "early snow to chase small white rabbits around fields"),
      (None, "too short")).toDF("doc_id", "text")
    val kept = Corpus.gopherGateKeep(docs, minTokens = 5)
    assert(kept.count() == 1, "identity-free gating must still filter")
  }
}
