package graft.etl

import graft.SparkSpec
import graft.core.Tables
import graft.operators.{Sessionize, TextAnalysis}
import org.apache.spark.sql.functions._

/** Warehouse-lifecycle additions: calendar gap-fill, CDC latest-wins
  * compaction, integer-exact anomaly cut, rational tf-idf ranking.
  */
class LifecycleSpec extends SparkSpec {

  test("gapFill densifies to a gap-free per-location calendar and forward-fills") {
    val out = TimeSeries.gapFill(spark, sf()).cache()
    try {
      // gap-free: per location, rows == span between min and max date
      val spans = out.groupBy("loc_ref")
        .agg(count(lit(1)).as("n"),
          (datediff(max("cal_date"), min("cal_date")) + 1).as("span"))
        .filter(col("n") =!= col("span"))
      assert(spans.count() === 0)
      // forward fill: no nulls anywhere (first row of each loc is observed)
      assert(out.filter(col("temp_filled").isNull).count() === 0)
      // synthesized days exist and carry the previous observed value
      val oneGap = out.filter(col("is_gap")).limit(1).collect()
      assert(oneGap.nonEmpty)
      val g = oneGap.head
      val prev = out
        .filter(col("loc_ref") === g.getAs[Long]("loc_ref") &&
          !col("is_gap") && col("cal_date") < g.getAs[java.sql.Date]("cal_date"))
        .orderBy(col("cal_date").desc).limit(1).collect().head
      assert(prev.getAs[Double]("temp_filled") === g.getAs[Double]("temp_filled"))
    } finally out.unpersist()
  }

  test("gapFill's chunked explode reproduces the single-explode rows exactly") {
    import spark.implicits._
    // one location with a 1000-day dormancy: the single-sequence form
    // would fan one row out 1000×; chunked (7-day chunks here) must
    // yield the identical row set
    val daily = Seq(
      (1L, "2020-01-01", 1000L, 1L),
      (1L, "2022-09-27", 2000L, 1L), // 1000 days later
      (2L, "2020-01-01", 1500L, 1L))
      .toDF("loc_ref", "d", "temp_c", "n_obs")
      .select(col("loc_ref"), col("d").cast("date").as("date_valid"),
        col("temp_c"), col("n_obs"))
    val chunked = TimeSeries.fillDaily(daily, chunkDays = 7)
      .orderBy("loc_ref", "cal_date").collect().toSeq
    val single = TimeSeries.fillDaily(daily, chunkDays = 100000)
      .orderBy("loc_ref", "cal_date").collect().toSeq
    assert(chunked == single)
    assert(chunked.size === 1001 + 1) // densified span + loc 2's lone day
    // and the default chunk bound holds on the real pipeline (hash-pinned
    // by the oracle): chunkDays=128 caps any one row's fan-out at
    // max(⌈gap/128⌉, 128) — √gap-shaped instead of gap-shaped
  }

  test("cdc same-seq delete beats the update (explicit op priority)") {
    import spark.implicits._
    val feed = Seq(
      (1L, "x", 1L, "I"),
      (1L, "y", 2L, "U"),
      (1L, "z", 2L, "D"), // same seq as the update: D must win → key gone
      (2L, "a", 1L, "I"))
      .toDF("k", "v", "seq", "op")
    val snap = Cdc.applyChanges(feed, Seq("k"))
    assert(snap.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((2L, "a")))
  }

  test("cdc applyChanges keeps the latest op per key and drops deletes") {
    val snap = Cdc.ordersSnapshot(spark, sf()).cache()
    try {
      val orders = Tables(spark, sf(), "orders")
      val nAll = orders.count()
      val nDeleted = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0).count()
      assert(snap.count() === nAll - nDeleted)
      // every 3rd (and not 10th) key carries the +1.00 correction,
      // everything else keeps its insert-time price
      val mismatch = snap.join(
        orders.select(col("o_orderkey"), col("o_totalprice").as("base_price")),
        "o_orderkey")
        .filter(
          when(pmod(col("o_orderkey"), lit(3)) === 0,
            col("o_totalprice") =!= round(col("base_price") + 1.0, 2))
            .otherwise(col("o_totalprice") =!= round(col("base_price"), 2)))
      assert(mismatch.count() === 0)
      assert(snap.filter(pmod(col("o_orderkey"), lit(3)) === 0).count() > 0)
    } finally snap.unpersist()
  }

  test("anomalies agrees with a double-precision z-score away from the boundary") {
    val ev = Tables(spark, sf(), "events")
    val out = Sessionize.anomalies(ev)
    // reference: plain floating z-score with a safety margin — every
    // |z| > 3.01 must be flagged, nothing with |z| < 2.99 may be
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_pop("value").as("sd"))
    val z = ev.join(stats, "event_type")
      .withColumn("z", (col("value") - col("mu")) / col("sd"))
    val must = z.filter(abs(col("z")) > 3.01).select("event_id")
    val mustNot = z.filter(abs(col("z")) < 2.99).select("event_id")
    assert(must.except(out.select("event_id")).count() === 0)
    assert(out.select("event_id").intersect(mustNot).count() === 0)
  }

  test("incremental merge equals the direct recompute over the same coverage") {
    val merged = Incremental.mergedMonthlyOrders(spark, sf()).collect().toSeq
    val direct = Tables(spark, sf(), "orders")
      .filter(col("o_orderdate") < lit("1998-06-16"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100, 0).cast("long")).cast("double") / 100.0)
          .as("total_price"))
      .orderBy("month", "o_orderstatus").collect().toSeq
    assert(merged == direct)
  }

  test("normalize strips stopwords and is idempotent on already-canonical text") {
    val docs = Tables(spark, sf(), "documents")
    val out = TextAnalysis.normalize(docs).cache()
    try {
      assert(out.count() === docs.count())
      // stopword drop can only shrink the CANONICAL token count (the raw
      // space-count is not comparable: 'a,b,c' canonicalizes into MORE
      // tokens than raw, so raw-vs-norm no-growth is corpus-dependent)
      val canonical = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      val nCanon = size(split(canonical, " ")).cast("long")
      val withCanon = out.join(docs.select(col("doc_id"), nCanon.as("n_canon")), "doc_id")
      assert(withCanon.filter(col("n_tokens_norm") > col("n_canon")).count() === 0)
      assert(withCanon.filter(col("n_tokens_norm") < col("n_canon")).count() > 0)
      // canonicalizing the canonical form is a fixpoint: re-normalizing
      // the kept-token join must reproduce the same md5
      import spark.implicits._
      val redo = docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          val kept = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
            .replaceAll(" +", " ").trim.split(" ")
            .filterNot(Set("the", "a", "of", "and", "to")).mkString(" ")
          (id, kept)
        }.toDF("doc_id", "norm_text")
      val joined = out.join(redo, "doc_id")
        .filter(md5(col("norm_text")) =!= col("norm_md5"))
      assert(joined.count() === 0)
    } finally out.unpersist()
  }

  test("tfidfTop ranks rare-but-frequent terms above ubiquitous ones") {
    val docs = Tables(spark, sf(), "documents")
    val out = TextAnalysis.tfidfTop(docs).cache()
    try {
      // exactly k rows per doc (ties broken, no doc lost)
      val perDoc = out.groupBy("doc_id").count()
      assert(perDoc.filter(col("count") =!= 3).count() === 0)
      assert(perDoc.count() === docs.count())
      // score really is tf*N/df rounded to 4
      val n = docs.count().toDouble
      val bad = out.filter(
        abs(col("score") - round(col("tf") * n / col("df"), 4)) > 1e-9)
      assert(bad.count() === 0)
    } finally out.unpersist()
  }
}
