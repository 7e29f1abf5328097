package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.etl.{Cdc, StarSchema}
import org.apache.spark.sql.functions._

/** Degenerate-input battery: at 100 TB every operator eventually meets
  * an empty day, an empty partition, an empty CDC feed or an empty
  * candidate set. Each case here pins "empty in → empty (or identity)
  * out, no crash" — the failure modes this guards against are driver
  * collects that assume ≥1 row, percentile/agg NULLs leaking into
  * arithmetic, and iterative loops that never terminate on zero work.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def docs0 = Tables(spark, sf(), "documents").limit(0)
  private def events0 = Tables(spark, sf(), "events").limit(0)
  private def emb0 = Tables(spark, sf(), "embeddings").limit(0)

  test("dedup family: empty corpus in, empty out") {
    assert(Dedup.exact(docs0).count() == 0)
    assert(Dedup.minhashLsh(docs0).count() == 0)
    assert(Dedup.simhash(docs0).count() == 0)
    assert(Dedup.ngramJaccard(docs0).count() == 0)
    assert(Corpus.paragraphDedup(docs0).count() == 0)
  }

  test("round-7 additions: empty in, empty (or zero-rule) out, no crash") {
    assert(Dedup.exactByPreference(docs0, lit(0)).count() == 0)
    assert(Corpus.cdcChunks(docs0).count() == 0)
    assert(Corpus.sourceOverlap(docs0).count() == 0)
    assert(Sketches.cmsSketch(docs0.select(col("text").as("item"))).cells.count() == 0)
    assert(Sketches.heavyHitters(docs0).count() == 0)
    // estimate against an EMPTY sketch: untouched cells read 0
    val est = Sketches.cmsEstimate(
      Sketches.cmsSketch(docs0.select(col("text").as("item"))),
      Seq("anything").toDF("item")).collect()
    assert(est.length == 1 && est.head.getLong(1) == 0L)
    // drift with an empty snapshot: NULL chi2, never a crash/Infinity
    val drift = graft.etl.Profile.histDriftBy(events0,
      dayofmonth(col("ts")) < 16, "value", "event_type", Seq(10.0, 50.0))
    assert(drift.count() == 0)
    // expectations on an empty table: rules report 0 checked, 0 violations
    val rep = graft.etl.Expectations.checkRows(events0, "events",
      Seq(graft.etl.Expectations.notNull("user_id"))).collect()
    assert(rep.length == 1 && rep.head.getLong(1) == 0L
      && rep.head.getLong(2) == 0L && rep.head.getBoolean(3))
    assert(graft.etl.Expectations.checkUnique(events0, "events",
      Seq("event_id")).head().getLong(2) == 0L)
    assert(graft.etl.Expectations.checkRelationship(events0, "events",
      "user_id", events0, "user_id").head().getLong(2) == 0L)
  }

  test("incremental dedup: empty batch keeps nothing; empty corpus keeps the whole batch") {
    val corpus = Tables(spark, sf(), "documents").limit(20)
    assert(Dedup.incremental(docs0, corpus).count() == 0)
    assert(Dedup.incremental(corpus, docs0).count()
      == corpus.select("text").distinct().count())
  }

  test("incremental NEAR-dup: empty batch keeps nothing; empty corpus keeps batch keepers") {
    val corpus = Tables(spark, sf(), "documents").limit(20)
    assert(Dedup.minhashIncremental(docs0, corpus).count() == 0)
    // vs an empty corpus only batch-internal near-dups can drop docs
    val kept = Dedup.minhashIncremental(corpus, docs0)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val dropped = Dedup.minhashLsh(corpus)
      .collect().map(_.getAs[Long]("doc_b")).toSet
    assert(kept == corpus.select("doc_id").collect()
      .map(_.getLong(0)).toSet -- dropped)
  }

  test("span dedup: empty corpus in, empty (or identity) out") {
    assert(Dedup.duplicateSpans(docs0).count() == 0)
    assert(Dedup.exciseSpans(docs0).count() == 0)
    assert(Dedup.gramTable(docs0).count() == 0)
    // empty batch probes to nothing; an empty gram index finds only
    // batch-internal spans (none in 3 distinct docs)
    val some = Tables(spark, sf(), "documents").limit(3)
    assert(Dedup.duplicateSpansProbe(docs0, Dedup.gramTable(some)).count() == 0)
    assert(Dedup.duplicateSpansProbe(some, Dedup.gramTable(docs0)).count()
      == Dedup.duplicateSpans(some).count())
    // excision against zero spans is the identity modulo tokenization
    val untouched = Dedup.exciseWith(some,
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "span_start", "span_end"))
    assert(untouched.count() == 3)
    assert(untouched.filter(col("n_removed") =!= 0L).count() == 0)
  }

  test("connectedComponents on zero edges returns zero labels (union-find fast path)") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Corpus.connectedComponents(pairs, "doc_a", "doc_b").count() == 0)
  }

  test("corpus pipelines: empty in, empty out") {
    assert(Corpus.trainTestSplit(docs0).count() == 0)
    assert(Corpus.qualityFilter(docs0).count() == 0)
    assert(Corpus.decontaminate(docs0).count() == 0)
    assert(Corpus.chunk(docs0).count() == 0)
    assert(Corpus.noveltyScore(docs0).count() == 0)
    assert(Redact.scrub(docs0).count() == 0)
  }

  test("sampling: empty in, empty out (incl. the two-phase global prefix sum)") {
    assert(Sampling.sourceQuota(docs0).count() == 0)
    assert(Sampling.mixture(docs0, Map("web" -> 0.5)).count() == 0)
    assert(Sampling.shardPack(docs0).count() == 0)
  }

  test("event analytics: empty stream in, empty out (no NULL aggregate rows)") {
    assert(Sessionize.sessions(events0).count() == 0)
    assert(Sessionize.winsorize(events0).count() == 0)
    assert(Sessionize.winsorize(events0, exact = true).count() == 0)
    assert(Sessionize.medianByType(events0).count() == 0)
    assert(Sessionize.retention(events0).count() == 0)
    assert(Sessionize.topKPerType(events0).count() == 0)
    assert(Sessionize.valueDeciles(events0).count() == 0)
  }

  test("CDC: an empty feed applies to an empty delta") {
    val feed = Cdc.ordersFeed(spark, sf()).limit(0)
    assert(Cdc.applyChanges(feed, Seq("o_orderkey")).count() == 0)
  }

  test("SCD2 merge with an empty snapshot is the identity on the dimension") {
    val dim = Seq(
      (1L, "k1", "a", "2024-01-01", "9999-12-31", true),
      (2L, "k2", "b", "2024-01-01", "9999-12-31", true)
    ).toDF("loc_key", "city", "cls", "valid_from", "valid_to", "is_current")
      .withColumn("valid_from", to_date(col("valid_from")))
      .withColumn("valid_to", to_date(col("valid_to")))
    val snap0 = dim.select("city", "cls").limit(0)
    val out = StarSchema.scd2Merge(dim, snap0, Seq("city"), Seq("cls"),
      "loc_key", "2024-06-01")
    assert(out.count() == 2)
    assert(out.filter(col("is_current")).count() == 2) // nothing closed
  }

  test("bloom join: an empty build side matches nothing and never NPEs") {
    val big = (1L to 100L).map(k => (k, k)).toDF("k", "v")
    val keys0 = Seq.empty[Long].toDF("id")
    assert(BloomJoin.buildBits(keys0, "id").forall(!_))
    assert(BloomJoin.bloomSemiJoin(big, "k", keys0, "id").count() == 0)
    assert(BloomJoin.bloomSemiJoinPacked(big, "k", keys0, "id").count() == 0)
  }

  test("similarity: empty corpus or empty probes yield empty top-k") {
    val emb = Tables(spark, sf(), "embeddings").limit(30)
    assert(Similarity.bruteForceTopK(emb0, emb.limit(2)).count() == 0)
    assert(Similarity.bruteForceTopK(emb, emb0).count() == 0)
    assert(Similarity.ivfTopK(emb, emb0).count() == 0)
    assert(Similarity.ivfTopK(emb0, emb.limit(2)).count() == 0)
  }

  test("BPE training on an empty corpus yields no merges") {
    assert(Bpe.train(docs0, k = 5) == Seq.empty)
  }

  test("URL dedup: empty in, empty out") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "url")
    assert(Redact.dedupByUrl(docs, "url").count() == 0)
  }

  test("session-4 additions: empty in, empty (or identity) out, no crash") {
    val orders0 = Tables(spark, sf(), "orders").limit(0)
    val lineitem0 = Tables(spark, sf(), "lineitem").limit(0)
    val customer0 = Tables(spark, sf(), "customer").limit(0)
    val customer = Tables(spark, sf(), "customer")

    assert(Sampling.mixtureWeights(docs0, Map("src0" -> 1.0)).count() == 0)
    assert(Sampling.packTrainingMix(docs0, Map("src0" -> 1.0)).count() == 0)
    assert(Segmentation.fuzzyNamePairs(docs0, "text").count() == 0)
    assert(Segmentation.resolveEntities(docs0, "text", "doc_id").count() == 0)
    assert(Sessionize.userGrowth(events0).count() == 0)
    assert(Sessionize.topPaths(events0).count() == 0)
    assert(Sessionize.robustOutliers(events0).count() == 0)
    assert(Sessionize.valueCdf(events0).count() == 0)
    assert(Sessionize.conversionLag(events0).count() == 0)
    assert(Sessionize.sessionLengthHist(events0).count() == 0)
    assert(Affinity.basketPairs(lineitem0).count() == 0)
    assert(graft.etl.TimeSeries.ohlcBars(events0).count() == 0)
    // churn with NO orders: every customer is churned, not a crash
    val churn = Segmentation.churnBySegment(customer, orders0)
    assert(churn.agg(sum("n_customers")).head().getLong(0) ==
      churn.agg(sum("n_churned")).head().getLong(0))
    assert(Segmentation.churnBySegment(customer0, orders0).count() == 0)
    assert(Segmentation.supplierLeadTime(lineitem0, orders0).count() == 0)
    // snapshot diff: both empty → empty; old-only → all deletes
    val o = Tables(spark, sf(), "orders")
      .select("o_orderkey", "o_orderstatus").limit(5)
    assert(graft.etl.Cdc.snapshotDiff(orders0.select("o_orderkey",
      "o_orderstatus"), orders0.select("o_orderkey", "o_orderstatus"),
      Seq("o_orderkey"), Seq("o_orderstatus")).count() == 0)
    val allD = graft.etl.Cdc.snapshotDiff(o,
      orders0.select("o_orderkey", "o_orderstatus"),
      Seq("o_orderkey"), Seq("o_orderstatus"))
    assert(allD.count() == 5 &&
      allD.filter(col("op") =!= "D").count() == 0)
    // join IVM: empty deltas → empty delta feed
    val o2 = Tables(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey").limit(5)
    assert(graft.etl.Incremental.joinDelta(o, o.limit(0), o2,
      o2.limit(0), Seq("o_orderkey")).count() == 0)
  }

  test("round-8 additions: empty in, empty (or identity) out, no crash") {
    // quantile sketch family: empty input -> empty sketch -> empty
    // estimates; merge of empties is empty
    val sk0 = Sketches.quantileSketch(events0.select("event_type", "value",
      "event_id"), Seq("event_type"), col("value"), col("event_id"))
    assert(sk0.count() == 0)
    assert(Sketches.quantileMerge(Seq("event_type"), Sketches.QsK, sk0)
      .count() == 0)
    assert(Sketches.quantileEstimate(sk0, Seq("event_type"),
      Seq("p50" -> 0.5)).count() == 0)
    // sketch defaults on empty events
    assert(graft.operators.Sessionize.winsorize(events0).count() == 0)
    assert(graft.operators.Sessionize.medianByType(events0).count() == 0)

    // phrase search: empty corpus and no-hit phrases are silent
    assert(Retrieval.phraseSearch(docs0, Seq(1 -> Seq("a", "b"))).count() == 0)
    assert(Retrieval.positionalPostings(docs0).count() == 0)
    val corpus = Tables(spark, sf(), "documents").limit(10)
    assert(Retrieval.phraseSearch(corpus,
      Seq(1 -> Seq("zzz_absent", "qqq_absent"))).count() == 0)

    // semantic decontamination: empty train -> empty; empty benchmark
    // -> whole train kept
    val embSmall = Tables(spark, sf(), "embeddings").limit(10)
    assert(Corpus.decontaminateSemantic(emb0, embSmall).count() == 0)
    assert(Corpus.decontaminateSemantic(embSmall, emb0).count()
      == embSmall.count())

    // script-aware segmentation: NULL and empty text pass through
    import spark.implicits._
    val seg = Seq[Option[String]](None, Some(""), Some("ab"))
      .toDF("text")
      .select(TextOps.segmentIfUnspaced(col("text")).as("s"))
      .collect().map(r => Option(r.getString(0)))
    assert(seg.toSeq == Seq(None, Some(""), Some("ab")))

    // IVF refresh against unchanged centroids: no-op, no crash
    val root = java.nio.file.Files.createTempDirectory("graft_e8").toString
    val cents = Similarity.strideCentroids(embSmall, stride = 5)
    Similarity.ivfAssignments(embSmall, cents)
      .write.partitionBy("cell_id").parquet(s"$root/assigned")
    Similarity.refreshAssignments(spark, s"$root/assigned", cents)
    assert(spark.read.parquet(s"$root/assigned").count() == embSmall.count())
  }
}
