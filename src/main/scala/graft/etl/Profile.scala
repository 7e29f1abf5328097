package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic table profiling: row count + per-column null and distinct
  * counts in ONE aggregate pass over the scan.
  *
  * `exact = false` (the 100 TB default) uses `approx_count_distinct`
  * (HyperLogLog++): every distinct counter is fixed-size mergeable
  * state, so the whole profile is a single partial-aggregating scan
  * with no Expand. `exact = true` is the small-data/audit variant: an
  * exact k-column distinct Expands the scan k+1 ways — fine for a
  * profiling job over a sample or a dimension, wrong as a default over
  * a fact. The exact form is what the DuckDB oracle checks; the approx
  * form is spec-bounded against it (ProfileSpec, within HLL++ rsd).
  */
object Profile {

  def tableProfile(df: DataFrame, cols: Seq[String],
                   exact: Boolean = false, rsd: Double = 0.05): DataFrame = {
    def distinctAgg(c: String) =
      if (exact) count_distinct(col(c))
      else approx_count_distinct(col(c), rsd)
    df.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        distinctAgg(c).as(s"distinct_$c"))): _*)
  }

  /** Fixed-bin histogram bucket for [[histDrift]]: bin i iff
    * value < edges(i), else the overflow bin edges.size. NULLs are
    * excluded by the caller.
    */
  private[etl] def binExpr(value: Column, edges: Seq[Double]): Column =
    edges.zipWithIndex.foldRight(lit(edges.size): Column) {
      case ((e, i), rest) => when(value < e, i).otherwise(rest)
    }

  /** Distribution-drift monitor: two-sample chi-square between
    * snapshots A and B of a numeric column, per group — the check a
    * training pipeline runs between yesterday's crawl and today's
    * before trusting its quality thresholds (a drifted feature
    * distribution silently re-tunes every downstream gate).
    *
    * Scale shape: ONE conditional-aggregate scan per snapshot — the
    * k+1 fixed bins become 2(k+1) integer counters per group, so the
    * shuffle carries one bounded-width row per group and nothing
    * value-grain ever moves. The chi-square is then UNROLLED over the
    * literal bins as one fixed expression tree (no distributive float
    * SUM whose addition order varies by partition): the same IEEE
    * operations in the same order in any engine, which is what lets
    * the DuckDB oracle hash-check a floating-point statistic.
    *
    * Empty-pooled bins contribute 0 (their expected counts are 0 by
    * construction); `drifted` flags chi2 above the caller's critical
    * value (df = populated bins − 1 under H0; the default is the 99th
    * percentile for k=5 bins, χ²₄ = 13.277).
    */
  def histDrift(a: DataFrame, b: DataFrame, valueCol: String,
                groupCol: String, edges: Seq[Double],
                critical: Double = 13.277): DataFrame =
    driftCore(
      a.select(col(groupCol), col(valueCol), lit(0).as("__s"))
        .unionByName(b.select(col(groupCol), col(valueCol), lit(1).as("__s"))),
      valueCol, groupCol, edges, critical)

  /** [[histDrift]] when both snapshots live in ONE table split by a
    * predicate (before/after a date, crawl batch A/B): the snapshot
    * tag is computed in the projection, so the whole comparison is a
    * single scan — two filtered reads of the same fact would scan it
    * twice for nothing.
    */
  def histDriftBy(df: DataFrame, inA: Column, valueCol: String,
                  groupCol: String, edges: Seq[Double],
                  critical: Double = 13.277): DataFrame =
    driftCore(
      df.select(col(groupCol), col(valueCol),
        when(inA, 0).otherwise(1).as("__s")),
      valueCol, groupCol, edges, critical)

  private def driftCore(snap: DataFrame, valueCol: String, groupCol: String,
                        edges: Seq[Double], critical: Double): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted, "edges must be sorted")
    val k = edges.size + 1
    val tagged = snap
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol), binExpr(col(valueCol), edges).as("__bin"),
        col("__s"))
    val counters = (0 until k).flatMap(i => Seq(
      sum(when(col("__bin") === i && col("__s") === 0, 1L).otherwise(0L))
        .as(s"a$i"),
      sum(when(col("__bin") === i && col("__s") === 1, 1L).otherwise(0L))
        .as(s"b$i")))
    val counted = tagged.groupBy(groupCol).agg(counters.head, counters.tail: _*)
    val na = (0 until k).map(i => col(s"a$i")).reduce(_ + _)
    val nb = (0 until k).map(i => col(s"b$i")).reduce(_ + _)
    val total = (na + nb).cast("double")
    def term(i: Int): Column = {
      val (oa, ob) = (col(s"a$i"), col(s"b$i"))
      val pooled = (oa + ob).cast("double")
      val ea = col("__na").cast("double") * pooled / col("__total")
      val eb = col("__nb").cast("double") * pooled / col("__total")
      when(oa + ob > 0,
        (oa.cast("double") - ea) * (oa.cast("double") - ea) / ea
          + (ob.cast("double") - eb) * (ob.cast("double") - eb) / eb)
        .otherwise(lit(0.0))
    }
    counted
      .withColumn("__na", na).withColumn("__nb", nb)
      .withColumn("__total", total)
      // a group seen in only one snapshot has no two-sample statistic:
      // NULL, not a division-by-zero Infinity
      .withColumn("chi2",
        when(col("__na") > 0 && col("__nb") > 0,
          round((0 until k).map(term).reduce(_ + _), 4)))
      .select(col(groupCol), col("__na").as("n_a"), col("__nb").as("n_b"),
        col("chi2"),
        coalesce(col("chi2") > critical, lit(false)).as("drifted"))
  }

  /** Grouped Pearson correlation with DISTRIBUTED-EXACT sufficient
    * statistics: `x` and `y` must be integer-valued expressions, so
    * n, Σx, Σy, Σxy, Σx², Σy² are exact BIGINTs accumulated in
    * DECIMAL(38) headroom — no float summation whose partition order
    * could change the answer (the events_anomaly doctrine applied to
    * correlation; a float `corr()` aggregate is order-dependent in its
    * last ulps and can differ across engines AND across runs). The
    * float assembly (two sqrt + one divide, all correctly rounded
    * under IEEE) happens once per GROUP on the exact integers.
    *
    * One partial-aggregating scan; the result is group-sized.
    * Zero-variance groups → NULL (no correlation is defined there).
    * The exact invariants stay exact at any scale; past 2^53 their
    * double CONVERSION rounds — emit the decimals themselves
    * alongside if last-ulp display parity across engines matters.
    *
    * CALLER CONTRACT: |x| and |y| must stay ≤ 3·10⁹ per row (any
    * cents/quantity grain is far inside this) so the per-row long
    * products can't wrap past 2^63. The bound is ENFORCED, not
    * assumed: under ANSI mode (Spark's default) a wrapping product
    * throws ARITHMETIC_OVERFLOW at scan time, and for non-ANSI
    * deployments the same scan tracks max(|x|,|y|) and raise_errors
    * past the bound — either way the query fails loudly instead of
    * silently corrupting the statistic. Switch the grain or widen
    * the products to decimal at the call site if it fires.
    */
  def corrBy(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val d = "decimal(38,0)"
    // decimal ACCUMULATORS, long terms: a LongType Σx² wraps silently
    // past 2^63 (x ~ 10^6 over 10^7 rows per group is enough) while
    // the oracle's SUM(BIGINT) promotes to HUGEINT — casting each term
    // to decimal(38,0) makes the sums exact to 10^38 on both sides.
    // The per-row PRODUCTS stay in long (metric inputs are rounded
    // ints; |x·y| < 2^63 holds through ~3·10^9 per axis — far past any
    // cents/quantity grain) because a 128-bit multiply per row costs
    // ~3× the whole aggregate; only the unbounded-row-count sums need
    // the wide accumulator. Incomplete pairs (NULL on either axis) are
    // dropped entirely, the standard corr() population — counting them
    // in n but not the sums would mix two populations into a statistic
    // that is the correlation of nothing.
    val agg = df
      .select(col(groupCol), x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).cast(d).as("__n"),
        sum(col("__x").cast(d)).cast(d).as("__sx"),
        sum(col("__y").cast(d)).cast(d).as("__sy"),
        sum((col("__x") * col("__y")).cast(d)).cast(d).as("__sxy"),
        sum((col("__x") * col("__x")).cast(d)).cast(d).as("__sxx"),
        sum((col("__y") * col("__y")).cast(d)).cast(d).as("__syy"),
        greatest(max(abs(col("__x"))), max(abs(col("__y"))))
          .as("__maxabs"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val d1 = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val d2 = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    // enforce the long-product bound loudly: past 3e9 per axis the
    // per-row x·y could wrap 2^63 — fail the query, never corrupt
    val bound = 3000000000L
    agg.select(col(groupCol), col("__n").cast("long").as("n_rows"),
      when(col("__maxabs") > bound,
        raise_error(concat(lit("corrBy: |input| exceeds the exact " +
          "long-product bound 3e9 in group "), col(groupCol).cast("string"))))
        .otherwise(
          when(d1 > 0 && d2 > 0, round(num / (sqrt(d1) * sqrt(d2)), 4)))
        .as("corr"))
      .orderBy(groupCol)
  }
}
