package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts emails, IPs and phones with typed sentinels and exact counts") {
    val docs = Seq(
      (1L, "contact alice.smith+spam@example.co.uk or bob@test.org today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 responded"),
      (3L, "call +1 (415) 555-0137 or 415-555-0199 or +44 20 7183 8750 now"),
      (4L, "released 2024-01-01 version 1.2.3.4.5 build 12345"),
      (5L, "mixed: eve@ex.io from 8.8.8.8 dialed +442071838750")
    ).toDF("doc_id", "text")
    val out = Redact.scrub(docs).orderBy("doc_id").collect()

    assert(out(0).getAs[String]("text")
      == s"contact ${Redact.EmailTok} or ${Redact.EmailTok} today")
    assert(out(0).getAs[Long]("n_emails") == 2L)
    assert(out(1).getAs[String]("text")
      == s"server at ${Redact.IpTok} and ${Redact.IpTok} responded")
    assert(out(1).getAs[Long]("n_ips") == 2L)
    assert(out(2).getAs[String]("text")
      == s"call ${Redact.PhoneTok} or ${Redact.PhoneTok} or ${Redact.PhoneTok} now")
    assert(out(2).getAs[Long]("n_phones") == 3L)
    // dates, dotted versions and bare digit runs are NOT PII matches
    assert(out(3).getAs[String]("text")
      == "released 2024-01-01 version 1.2.3.4.5 build 12345")
    assert(Seq("n_emails", "n_ips", "n_phones")
      .forall(c => out(3).getAs[Long](c) == 0L))
    assert(out(4).getAs[String]("text")
      == s"mixed: ${Redact.EmailTok} from ${Redact.IpTok} dialed ${Redact.PhoneTok}")
    assert((out(4).getAs[Long]("n_emails"),
      out(4).getAs[Long]("n_ips"), out(4).getAs[Long]("n_phones")) == (1L, 1L, 1L))
  }

  test("scrub is idempotent and precedence never double-counts") {
    val docs = Seq((1L, "eve@ex.io 8.8.8.8 +442071838750 415-555-0199")).toDF("doc_id", "text")
    val once = Redact.scrub(docs)
    val twice = Redact.scrub(once)
    assert(twice.select("text").head().getString(0)
      == once.select("text").head().getString(0))
    assert(twice.select("n_emails", "n_ips", "n_phones").head()
      == org.apache.spark.sql.Row(0L, 0L, 0L)) // nothing left to find
    // an email's digit run is not also a phone; an IP is not a phone
    assert(once.select("n_phones").head().getLong(0) == 2L)
  }

  test("scrub composes with quality scoring in one scan (no join, no shuffle before agg)") {
    // no .limit(): a mid-plan GlobalLimit would insert its own
    // SinglePartition exchange and mask the property under test
    val docs = graft.core.Tables(spark, sf(), "documents")
    val composed = Redact.scrub(docs)
      .withColumn("q", TextAnalysis.qualityScoreExpr(col("text")))
    assert(composed.count() == 500)
    val plan = composed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redact+quality pipeline shuffled:\n$plan")
  }

  test("sentence-final IPs redact; longer digit runs stay whole, never part-redacted") {
    val docs = Seq(
      (1L, "our dns is 8.8.8.8."),                  // sentence-final IP
      (2L, "id +12345678901234567890 is not a phone"), // 20-digit run
      (3L, "range +44 20 7183 8750 2024-01-01")     // date after a phone
    ).toDF("doc_id", "text")
    val out = Redact.scrub(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == s"our dns is ${Redact.IpTok}.")
    assert(out(0).getAs[Long]("n_ips") == 1L)
    assert(out(1).getAs[String]("text") == "id +12345678901234567890 is not a phone")
    assert(out(1).getAs[Long]("n_phones") == 0L)
    assert(out(2).getAs[String]("text")
      == s"range ${Redact.PhoneTok} 2024-01-01")
    assert(out(2).getAs[Long]("n_phones") == 1L)
  }

  test("normalizeUrl canonicalizes case/ports/fragments/trackers and keeps param order") {
    val got = Seq(
      "HTTP://Example.COM:80/Path/Page?b=2&utm_source=x&a=1#frag",
      "https://example.com:443/",
      "https://example.com:8443/x",
      "http://example.com",
      "http://example.com/?utm_source=a&fbclid=b",
      "http://example.com/?ref=c",
      "not a url"
    ).toDF("u").select(Redact.normalizeUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("http://example.com/Path/Page?b=2&a=1")) // order kept, tracker gone
    assert(got(1).contains("https://example.com/"))
    assert(got(2).contains("https://example.com:8443/x")) // non-default port survives
    assert(got(3).contains("http://example.com/"))
    assert(got(4).contains("http://example.com/")) // all-tracker query drops the '?'
    assert(got(5).contains("http://example.com/?ref=c")) // generic 'ref' is content-bearing: kept
    assert(got(6).isEmpty) // unparseable → NULL, filterable
  }

  test("dedupByUrl keeps min doc_id per canonical URL and all uncanonicalizable rows") {
    val docs = Seq(
      (3L, "http://Example.com/a?utm_source=x"),
      (1L, "http://example.com:80/a"),
      (2L, "http://example.com/b"),
      (4L, "no scheme here"),
      (5L, "no scheme here")
    ).toDF("doc_id", "url")
    val kept = Redact.dedupByUrl(docs, "url").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L, 5L)) // 3 deduped into 1; 4,5 both kept
  }

  test("kAnonymity counts classes and rows below k; NULL QI is a class") {
    val rows = Seq(
      ("us", "a"), ("us", "a"), ("us", "a"),      // class of 3 (below 5)
      ("de", "b"), ("de", "b"), ("de", "b"), ("de", "b"), ("de", "b"),
      (null, "c"), (null, "c"))                   // NULL class of 2
      .toDF("nation", "segment")
    val r = Redact.kAnonymity(rows, Seq("nation", "segment"), k = 5).head()
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_classes_below_k") == 2L)
    assert(r.getAs[Long]("n_rows_at_risk") == 5L)
    assert(r.getAs[Long]("min_class_size") == 2L)
    assert(r.getAs[Long]("n_rows") == 10L)
  }
}
