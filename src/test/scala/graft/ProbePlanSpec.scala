package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.streaming.{EmbeddingIndex, ExactIndex, NearDupIndex, SpanIndex}

/** Pins the probe-side shuffle contract of the persisted indexes: a
  * probe plan may shuffle BATCH-derived rows, but an index frame only
  * ever STREAMS through its scan — no ShuffleExchange anywhere above a
  * file scan of an index directory. This is the structural form of the
  * INDEX_SCALE.md cliff: an un-hinted probe join builds on whichever
  * side fits, so under the 10 MB auto-broadcast threshold everything
  * looks fine, and past it the planner silently degrades to shuffling
  * index keys ∝ corpus on every micro-batch. The test disables
  * auto-broadcast entirely — only the probes' explicit batch-side
  * broadcast hints remain — so the contract is proven structurally,
  * not by fitting under a threshold.
  */
class ProbePlanSpec extends SparkSpec {
  import spark.implicits._

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case other => other.children
  }

  private def scansDir(p: SparkPlan, dir: String): Boolean = p match {
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.exists(_.toString.contains(dir))
    case other => kids(other).exists(scansDir(_, dir))
  }

  /** True when RAW (not yet batch-filtered) index rows flow below `p`:
    * an index scan with no intervening broadcast join. A broadcast
    * join collision-filters the streamed index side down to
    * batch-bounded rows — shuffles ABOVE it (candidate distincts,
    * keeper aggregates) move ∝ batch and are legitimate; a shuffle
    * that sees the scan with no such join in between is moving the
    * index itself.
    */
  private def rawIndexBelow(p: SparkPlan, dir: String): Boolean = p match {
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.exists(_.toString.contains(dir))
    case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => false
    case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => false
    case other => kids(other).exists(rawIndexBelow(_, dir))
  }

  /** Asserts no shuffle has the index scan below it. Runs against the
    * STATIC physical plan (AQE disabled by the test): with
    * auto-broadcast off, join strategies are fixed at planning, and
    * AQE's empty-relation propagation would otherwise fold the whole
    * anti-join away (an all-new batch matches nothing) and leave
    * nothing to assert on.
    */
  private def assertIndexStreams(df: DataFrame, dir: String): Unit = {
    val plan = df.queryExecution.executedPlan
    def walk(p: SparkPlan): Unit = p match {
      case s: ShuffleExchangeLike =>
        assert(!rawIndexBelow(s, dir),
          s"index frame under $dir is SHUFFLED by the probe:\n$plan")
        kids(s).foreach(walk)
      case other => kids(other).foreach(walk)
    }
    walk(plan)
    // sanity: the plan really does read the index (the assertion must
    // not pass vacuously because the frame got folded away)
    assert(scansDir(plan, dir), s"probe plan never scans $dir — vacuous test")
    df.collect() // and the plan must actually run
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_probeplan_$name").toString

  test("index probes stream the index frames even with auto-broadcast off") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .select(col("doc_id"), col("text")).limit(300)
    val batch = docs.limit(60).select(
      (col("doc_id") + 500000L).as("doc_id"),
      concat(lit("zq "), col("text")).as("text"))
      .localCheckpoint()
    val vecs = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(200)
    val vbatch = vecs.limit(40).select(
      (col("vec_id") + 500000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    batch.count(); vbatch.count()

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exactDir = tmp("exact")
      val exact = new ExactIndex(spark, exactDir)
      exact.append(docs)
      assertIndexStreams(
        Dedup.exactProbe(batch, exact.hashes), exactDir)

      val ndDir = tmp("neardup")
      val nd = new NearDupIndex(spark, ndDir)
      nd.append(docs)
      assertIndexStreams(
        Dedup.minhashProbe(batch, nd.postings, nd.shingles), ndDir)

      val spanDir = tmp("span")
      val span = new SpanIndex(spark, spanDir)
      span.append(docs)
      assertIndexStreams(
        Dedup.duplicateSpansProbe(batch, span.grams), spanDir)

      val embDir = tmp("emb")
      val emb = new EmbeddingIndex(spark, embDir, bands = 8, rowsPerBand = 6)
      emb.append(vecs)
      assertIndexStreams(
        Similarity.embeddingProbe(vbatch, emb.postings, emb.vectors,
          bands = 8, rowsPerBand = 6), embDir)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("probe guard fails soft: above the row bound the probe side " +
       "shuffle-hashes instead of broadcasting, result identical") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val batch = docs.limit(40).select(
      (col("doc_id") + 500000L).as("doc_id"),
      concat(lit("zq "), col("text")).as("text"))
      .localCheckpoint()
    batch.count()
    val ndDir = tmp("guard")
    val nd = new NearDupIndex(spark, ndDir)
    nd.append(docs)

    def hasShuffledHash(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case other => kids(other).exists(hasShuffledHash)
    }
    def hasBroadcastHash(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case other => kids(other).exists(hasBroadcastHash)
    }

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // fast path (default bound): probe side broadcasts
      val fast = Dedup.minhashProbe(batch, nd.postings, nd.shingles)
      assert(hasBroadcastHash(fast.queryExecution.executedPlan),
        "default-bound probe must broadcast the probe side")
      val fastRows = fast.as[Long].collect().toSeq

      // adversarial regime (bound = 0): the guard must choose
      // shuffle_hash — degraded, not dead — with the SAME result
      spark.conf.set(graft.core.ProbeGuard.ConfKey, "0")
      val slow = Dedup.minhashProbe(batch, nd.postings, nd.shingles)
      assert(hasShuffledHash(slow.queryExecution.executedPlan),
        "above-bound probe must degrade to a shuffled hash join:\n" +
          slow.queryExecution.executedPlan)
      assert(slow.as[Long].collect().toSeq == fastRows,
        "guard regimes must be semantically identical")
    } finally {
      spark.conf.unset(graft.core.ProbeGuard.ConfKey)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("probe guard is byte-aware: a frame under the row bound but over " +
       "the byte bound still degrades to shuffle_hash, result identical") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val batch = docs.limit(40).select(
      (col("doc_id") + 500000L).as("doc_id"),
      concat(lit("zq "), col("text")).as("text"))
      .localCheckpoint()
    batch.count()
    val ndDir = tmp("byteguard")
    val nd = new NearDupIndex(spark, ndDir)
    nd.append(docs)

    def hasShuffledHash(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case other => kids(other).exists(hasShuffledHash)
    }

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fastRows = Dedup.minhashProbe(batch, nd.postings, nd.shingles)
        .as[Long].collect().toSeq
      // rows fit the 1M row bound with room to spare, but a 1-byte
      // byte bound must push the guard onto the fail-soft path — this
      // is ADVICE r11's ~1 KB/row shingle frame scenario in miniature
      spark.conf.set(graft.core.ProbeGuard.BytesConfKey, "1")
      val slow = Dedup.minhashProbe(batch, nd.postings, nd.shingles)
      assert(hasShuffledHash(slow.queryExecution.executedPlan),
        "over-byte-bound probe must degrade to a shuffled hash join:\n" +
          slow.queryExecution.executedPlan)
      assert(slow.as[Long].collect().toSeq == fastRows,
        "byte-guard regimes must be semantically identical")
    } finally {
      spark.conf.unset(graft.core.ProbeGuard.BytesConfKey)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("basketPairs guards its catalog-grain count broadcast: small " +
       "catalog broadcasts, adversarial bound shuffle-hashes, identical") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).limit(3000)
      .localCheckpoint()
    li.count()

    def hasShuffledHash(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case other => kids(other).exists(hasShuffledHash)
    }
    def hasBroadcastHash(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case other => kids(other).exists(hasBroadcastHash)
    }

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fast = graft.operators.Affinity.basketPairs(li)
      assert(hasBroadcastHash(fast.queryExecution.executedPlan),
        "dim-sized item counts must broadcast on the fast path")
      // the operator returns unsorted (hash-stability sorts live in the
      // verify ledger) — order both regimes for the row-wise compare
      val fastRows = fast.orderBy("part_a", "part_b")
        .collect().map(_.toSeq).toSeq

      // a "100M-item catalog" in miniature: force the guard's
      // fail-soft path and require the SAME lift table
      spark.conf.set(graft.core.ProbeGuard.ConfKey, "0")
      val slow = graft.operators.Affinity.basketPairs(li)
      assert(hasShuffledHash(slow.queryExecution.executedPlan),
        "over-bound item counts must shuffle-hash, not hard-fail:\n" +
          slow.queryExecution.executedPlan)
      assert(slow.orderBy("part_a", "part_b")
          .collect().map(_.toSeq).toSeq == fastRows,
        "guard regimes must produce the identical lift table")
    } finally {
      spark.conf.unset(graft.core.ProbeGuard.ConfKey)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
