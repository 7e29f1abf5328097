package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction and URL canonicalization for training corpora.
  *
  * Web-scale training data carries emails, phone numbers, bare IPs and
  * tracker-laden URLs; scrubbing them is a standard pre-training pass
  * (and canonical URLs are the usual key for URL-level dedup). Both
  * operators here are pure per-row expression chains — regexp_replace /
  * parse_url / array ops, all codegen — so they run at scan speed with
  * zero shuffles and compose into the same single-scan pipelines as
  * [[TextAnalysis]] (quality scoring, token counts) without a join.
  *
  * Patterns are deliberately conservative: high-precision shapes with
  * typed sentinel tokens, not a best-effort NER. The operator contract
  * is the redaction mechanism (order, counting, idempotence — all
  * spec-pinned in RedactSpec); lexicon/recall tuning is config, exactly
  * like [[TextAnalysis.Markers]].
  */
object Redact {

  /** user@host.tld — the unambiguous PII shape, redacted first so its
    * digit runs can never feed the phone pattern.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4. The trailing guard rejects a CONTINUING dotted
    * run (`.digit` — version strings like "1.2.3.4.5") but not a bare
    * sentence-final period, so "server is 8.8.8.8." still redacts.
    * Runs before phones for the same digit-run reason as emails.
    */
  val Ipv4Re = "(?<![\\d.])(?:\\d{1,3}\\.){3}\\d{1,3}(?!\\.?\\d)"

  /** Phone numbers, as ordered format alternations: compact/punctuated
    * international +NNNNNNN… (7-15 digits, no spaces — an unconstrained
    * space separator would let one greedy match swallow across the gap
    * between TWO adjacent numbers), +CC (AAA) NNN-NNNN, space-grouped
    * international +CC NN NNNN NNNN, and separator-grouped
    * NNN-NNN-NNNN. Every alternation carries a trailing boundary so a
    * longer digit run is left WHOLE rather than part-redacted (a
    * 20-digit run is not a phone; "<phone>67890" residue would be
    * worse than no match), and the space-grouped form additionally
    * refuses to end adjacent to a `-` so "+CC NN NNNN NNNN 2024-01-01"
    * never swallows the date's year as a 4th group. ISO dates
    * themselves (4-2-2 grouping) deliberately do NOT match.
    */
  val PhoneRe =
    "\\+\\d(?:[\\-().]{0,2}\\d){6,14}(?!\\d)" +
      "|\\+\\d{1,3} ?\\(\\d{2,4}\\) ?\\d{3}[ \\-.]?\\d{4}(?!\\d)" +
      "|\\+\\d{1,3}(?: \\d{2,4}){2,4}(?![\\d\\-])" +
      "|(?<!\\d)\\d{3}[ \\-.]\\d{3}[ \\-.]\\d{4}(?!\\d)"

  val EmailTok = "<email>"
  val IpTok = "<ip>"
  val PhoneTok = "<phone>"

  // The redaction chain, single-sourced as three steps so scrubExpr
  // and scrub's audit counts can never drift apart.
  private def dropEmails(text: Column): Column =
    regexp_replace(text, EmailRe, EmailTok)
  private def dropIps(text: Column): Column =
    regexp_replace(text, Ipv4Re, IpTok)
  private def dropPhones(text: Column): Column =
    regexp_replace(text, PhoneRe, PhoneTok)

  /** The scrubbed text as one per-row expression: emails, then IPs,
    * then phones (most- to least-distinctive, so no pattern sees
    * another's digit runs). Idempotent — sentinels contain no digits
    * or '@', so re-scrubbing is the identity (spec-pinned).
    */
  def scrubExpr(text: Column): Column =
    dropPhones(dropIps(dropEmails(text)))

  /** Per-document scrub + audit counts (counted BEFORE redaction, on
    * the same precedence: an email's digits are never double-counted
    * as a phone). Output grain = input grain; `text` is replaced.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val noEmail = dropEmails(t)
    val noIp = dropIps(noEmail)
    docs.withColumns(Map(
      "n_emails" -> regexp_count(t, lit(EmailRe)).cast("long"),
      "n_ips" -> regexp_count(noEmail, lit(Ipv4Re)).cast("long"),
      "n_phones" -> regexp_count(noIp, lit(PhoneRe)).cast("long"),
      textCol -> dropPhones(noIp)))
  }

  /** Tracking query parameters stripped by [[normalizeUrl]]. Only the
    * UNAMBIGUOUS tracker names: a generic name like `ref` is often a
    * content-bearing selector (branch, version, referenced resource),
    * and stripping it would merge genuinely distinct URLs — for a
    * DEDUP key, a false merge silently drops documents, so precision
    * beats recall here.
    */
  val TrackerParams: Seq[String] =
    Seq("utm_source", "utm_medium", "utm_campaign", "utm_term",
      "utm_content", "fbclid", "gclid", "msclkid")

  /** Canonical URL for URL-level dedup: scheme+host lowercased, default
    * ports and fragments dropped, tracking parameters removed (other
    * params kept IN ORIGINAL ORDER — reordering would merge URLs whose
    * servers treat order as significant), empty path → "/". NULL/
    * unparseable input (no host) → NULL, so malformed rows are
    * filterable rather than silently passed through.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(try_parse_url(url, lit("PROTOCOL")))
    val host = lower(try_parse_url(url, lit("HOST")))
    // parse_url has no PORT key and HOST drops it — recover the port
    // from AUTHORITY so :8080 stays distinct, eliding only the
    // scheme-default ports.
    val port = regexp_extract(try_parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val rawPath = try_parse_url(url, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", "/").otherwise(rawPath)
    val query = try_parse_url(url, lit("QUERY"))
    val kept = filter(split(query, "&"), kv =>
      !lower(split(kv, "=").getItem(0))
        .isin(TrackerParams.map(lit(_)): _*) && kv =!= "")
    val queryPart = when(query.isNull || size(kept) === 0, "")
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(host.isNull || scheme.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** URL-keyed dedup: keep one row per canonical URL (min doc_id —
    * the repo's standard deterministic keeper rule). One hash shuffle
    * on the canonical key, exactly the [[Dedup.exact]] scale shape;
    * rows whose URL fails to canonicalize are all kept (NULL key ≠
    * NULL key).
    */
  def dedupByUrl(docs: DataFrame, urlCol: String,
                 idCol: String = "doc_id"): DataFrame = {
    val canon = docs.withColumn("__canon", normalizeUrl(col(urlCol)))
    val keepers = canon.filter(col("__canon").isNotNull)
      .groupBy("__canon").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    canon.filter(col("__canon").isNull).drop("__canon")
      .unionByName(canon.join(keepers, Seq(idCol), "left_semi").drop("__canon"))
  }

  /** k-anonymity release audit — the other half of the privacy story
    * next to [[scrub]]: scrubbing removes DIRECT identifiers, but a
    * row whose QUASI-identifier combination (e.g. nation × segment) is
    * shared by fewer than k rows is re-identifiable by linkage even
    * with no direct identifier left. One row: equivalence-class
    * counts, how many classes and rows fall below k, and the smallest
    * class (the worst case a release reviewer reads first).
    *
    * Scale shape: one hash aggregate at QI grain (map-side combined —
    * a dominant class ships one row per map partition), then an
    * audit-sized re-aggregate. NULL QI values form their own classes,
    * as linkage attacks treat missingness as a value too.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long = 5): DataFrame =
    df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_classes_below_k"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_rows_at_risk"),
        min("n").as("min_class_size"),
        sum("n").as("n_rows"))
}
