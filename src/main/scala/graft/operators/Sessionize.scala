package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators: gap sessionization, tumbling-window
  * aggregation, leaderboards.
  *
  * Scale notes: sessionization shuffles once on user_id and evaluates
  * both window passes (gap flag, running session index) over the same
  * partition+sort; per-user data is small by construction so no key can
  * hot-spot a 1000-executor cluster. The aggregations are partial-agg
  * friendly.
  */
object Sessionize {

  final val SampleMod = 8 // quantile sample: mixed event_id % 8 == 0 (12.5%)

  /** 30-minute-gap sessionization. A session starts where the gap to the
    * previous event of the same user exceeds `gapMinutes` (or at the
    * user's first event); running count of starts numbers the sessions.
    * Timestamps are exposed as epoch micros so cross-engine comparison is
    * integer-exact.
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("new_session",
        when(lag("us", 1).over(w).isNull ||
          col("us") - lag("us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("us").as("start_us"),
        max("us").as("end_us"),
        (round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Ordered signup→click→purchase conversion funnel. A click counts
    * only at-or-after the user's first signup; a purchase only
    * at-or-after that first qualifying click. Everything rides ONE
    * user_id exchange: three Window passes over the same partition+sort
    * compute the running stage timestamps, then a per-user aggregate
    * collapses to stage flags. Epoch-micro timestamps keep the
    * comparisons integer-exact.
    */
  def funnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("s_us",
        min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("c_us",
        min(when(col("event_type") === "click" && col("s_us").isNotNull,
          col("us"))).over(w))
      .withColumn("p_us",
        min(when(col("event_type") === "purchase" && col("c_us").isNotNull,
          col("us"))).over(w))
    staged.groupBy("user_id")
      .agg(max(col("s_us").isNotNull).as("signed_up"),
        max(col("c_us").isNotNull).as("clicked"),
        max(col("p_us").isNotNull).as("purchased"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("signed_up"), 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("clicked"), 1L).otherwise(0L)).as("n_click_after_signup"),
        sum(when(col("purchased"), 1L).otherwise(0L)).as("n_purchase_after_click"))
  }

  /** Daily cohort retention: users cohorted by first-activity date;
    * day-k retention = distinct users of that cohort active k days
    * later. The user→cohort map is user-grain (large at 100 TB), so it
    * joins back to activity co-partitioned on user_id — the join reuses
    * the cohort aggregate's exchange instead of broadcasting — before
    * the final cohort×k aggregate.
    */
  def retention(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = activity.groupBy("user_id").agg(min("day").as("cohort_day"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day"))
        .cast("long").as("day_k"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_k")
  }

  /** The deterministic quantile-sample flag of [[approxStats]]:
    * avalanche-hash the event id, keep 1/`sampleMod` of the stream.
    * Content-derived (stable under re-partitioning/re-ingestion) and
    * BIGINT-exact, so any engine draws the same sample. (Fixed-
    * FRACTION — its state grows with the data; [[winsorize]] and
    * [[medianByType]] moved to the fixed-SIZE
    * [[Sketches.quantileSketch]] basis. approxStats keeps it because
    * its contract exposes `n_sample` over the full stream.)
    */
  private def sampledValue(sampleMod: Int): Column =
    when(graft.functions.Hll.mix31(col("event_id"), 15, 14, 15)
      % sampleMod === 0, col("value"))

  /** Winsorization: clip each type's values to its [p01, p99] band —
    * the standard outlier guard before training on a metric. Two passes
    * over events (bounds aggregate, then clip+re-aggregate); the
    * per-type bounds table is tiny and broadcasts.
    *
    * `exact = true` (the oracle/audit path) takes the percentiles over
    * every value: Spark's `percentile` buffers a value→count map
    * bounded only by DISTINCT VALUES, and over a continuous measure
    * that is per-type state growing with the data — at 100 TB the
    * final per-type merge OOMs one task. The default estimates the
    * bounds from [[Sketches.quantileSketch]] — the deterministic
    * bottom-`k` row sample whose state is FIXED at k rows per type no
    * matter how the stream grows (the fixed-fraction 1/`sampleMod`
    * hash sample this replaced still grew with the data): same
    * interpolation, shuffle bounded to k×types by WindowGroupLimit.
    * Clipping-rate deviation vs exact is bounded in SessionizeSpec;
    * exact percentiles match DuckDB's quantile_cont interpolation, so
    * the exact form hash-checks, and the sketch itself hash-checks as
    * the quantile_sketch oracle query.
    *
    * A type with ≤ k rows keeps ALL its rows in the sketch, so small
    * types are EXACT by construction — no fallback path exists to get
    * wrong (the old fixed-fraction basis needed a min/max rescue for
    * types its sample missed entirely).
    */
  def winsorize(events: DataFrame, lo: Double = 0.01, hi: Double = 0.99,
                exact: Boolean = false,
                k: Int = Sketches.QsK): DataFrame = {
    val bounds =
      if (exact)
        events.groupBy("event_type")
          .agg(coalesce(percentile(col("value"), lit(lo)), min(col("value")))
            .as("p_lo"),
            coalesce(percentile(col("value"), lit(hi)), max(col("value")))
              .as("p_hi"))
      else
        // NULL values are filtered BEFORE the sketch: the bottom-k
        // sample keeps rows regardless of value nullness, so a type
        // whose k lowest-hash rows all carried NULL would estimate
        // its bounds from nothing even when non-null values exist
        // elsewhere in the stream (the exact path's `percentile`
        // ignores NULLs by definition). Filtering also spends the
        // whole k-row budget on usable values. An all-NULL type then
        // has no bounds row — the clip join below is LEFT so such a
        // type still passes through with NULL bounds, exactly as the
        // exact path emits (NULL p_lo/p_hi).
        Sketches.quantileSketch(
            events.select("event_type", "value", "event_id")
              .filter(col("value").isNotNull),
            Seq("event_type"), col("value"), col("event_id"), k)
          .groupBy("event_type")
          .agg(coalesce(percentile(col("__qv"), lit(lo)), min(col("__qv")))
            .as("p_lo"),
            coalesce(percentile(col("__qv"), lit(hi)), max(col("__qv")))
              .as("p_hi"))
    events.join(broadcast(bounds), Seq("event_type"), "left")
      .select(col("event_type"), col("value"), col("p_lo"), col("p_hi"),
        least(greatest(col("value"), col("p_lo")), col("p_hi")).as("w"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") < col("p_lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("value") > col("p_hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        (round(sum("w") * 100, 0) / 100.0).as("winsorized_total"))
      .orderBy("event_type")
  }

  /** Grouped median. `exact = true` is the oracle path (sort-based
    * `percentile` with linear interpolation — per-type state bounded
    * only by distinct values, so audit-scale data only); the default
    * interpolates over [[Sketches.quantileSketch]]'s deterministic
    * bottom-`k` row sample — per-type state FIXED at k rows forever
    * (the fixed-fraction hash sample this replaced still grew with
    * the data), shuffle bounded to k×types by WindowGroupLimit.
    * `n_events` always counts the full stream: the sample feeds only
    * the quantile. Sample-vs-exact deviation is bounded in
    * SessionizeSpec; a type with ≤ k rows keeps all its rows, so
    * small types are EXACT (no midrange fallback needed — the old
    * fixed-fraction basis could miss a tiny type entirely).
    */
  def medianByType(events: DataFrame, exact: Boolean = false,
                   k: Int = Sketches.QsK): DataFrame = {
    if (exact)
      events.groupBy("event_type")
        .agg(round(coalesce(percentile(col("value"), lit(0.5)),
          (min(col("value")) + max(col("value"))) / 2), 4).as("median_value"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    else {
      // NULL values filtered BEFORE sampling (see [[winsorize]]): the
      // sample must spend its k rows on values that can carry a
      // median — without the filter a type whose k lowest-hash rows
      // all held NULL reported median NULL even when non-null values
      // existed elsewhere. An all-NULL type keeps its row via the
      // LEFT join below (median NULL), matching the exact path.
      val med = Sketches.quantileSketch(
          events.select("event_type", "value", "event_id")
            .filter(col("value").isNotNull),
          Seq("event_type"), col("value"), col("event_id"), k)
        .groupBy("event_type")
        .agg(round(percentile(col("__qv"), lit(0.5)), 4).as("median_value"))
      events.groupBy("event_type").agg(count(lit(1)).as("n_events"))
        .join(broadcast(med), Seq("event_type"), "left")
        .select(col("event_type"), col("median_value"), col("n_events"))
        .orderBy("event_type")
    }
  }

  /** Top-N users by total event value (2-decimal-exact cents sum). */
  def topUsers(events: DataFrame, n: Int = 10): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(n)

  /** Top-k events per type by value (per-GROUP top-k, vs [[topUsers]]'
    * global top-n). The rank filter is planned as WindowGroupLimit on
    * both sides of the exchange, so each partition ships only its local
    * top-k — the shuffle carries k×groups rows, not the event stream.
    */
  def topKPerType(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    events
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("event_type", "rank")
  }

  /** Decile segmentation of users by total value — WITHOUT the
    * unpartitioned ntile window. SQL-standard `ntile(k)` over n rows
    * makes the FIRST n mod k buckets one row larger (not evenly
    * spread — floor((rank-1)k/n) gets that wrong whenever k ∤ n):
    * with q = n div k, m = n mod k, the first m buckets have q+1 rows,
    * so rank r maps to ceil(r/(q+1)) inside the first (q+1)·m ranks
    * and m + ceil((r - (q+1)m)/q) after. Rank comes from the scalable
    * [[graft.etl.StarSchema.globalRank]] and n from a 1-row broadcast,
    * so no single task ever sees the whole user list. The window input
    * is the user-sized aggregate, never the raw event stream.
    */
  def valueDeciles(events: DataFrame, k: Int = 10): DataFrame = {
    val totals = events.groupBy("user_id")
      .agg((round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .withColumn("__neg", -col("total_value"))
    val n = totals.agg(count(lit(1)).as("__n"))
    val q = floor(col("__n") / k).cast("long")
    val m = col("__n") % k
    val cut = (q + 1) * m
    val r = col("__rank")
    graft.etl.StarSchema.globalRank(totals, Seq("__neg", "user_id"), "__rank")
      .crossJoin(broadcast(n))
      .withColumn("decile",
        when(r <= cut, floor((r + q) / (q + lit(1))))
          .otherwise(m + floor((r - cut + q - 1) / q))
          .cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        (round(sum("total_value") * 100, 0) / 100.0).as("decile_value"))
      .orderBy("decile")
  }

  /** Per-day Apache DataSketches HLL sketches of distinct users.
    *
    * The point at 100 TB: the daily job emits a FIXED-SIZE binary
    * sketch per day instead of a user set; any ad-hoc date range is
    * then answered by merging sketches ([[mergedUserEstimate]]) without
    * re-touching raw events. HLL register-merge is associative and
    * idempotent, so the merged estimate is IDENTICAL to a single-pass
    * sketch over the same rows (spec-asserted, not just approximately).
    */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Merge daily sketches into one distinct-user estimate. */
  def mergedUserEstimate(daily: DataFrame): DataFrame =
    daily.agg(
      hll_sketch_estimate(hll_union_agg(col("user_sketch")))
        .as("approx_distinct_users"))

  /** Month-grain distinct users via GROUPED register re-aggregation —
    * the batch twin of the streaming HLL register emission, under the
    * oracle hash check: the DAILY registers a nightly job would
    * persist (graft's deterministic 512-register HLL, [[graft.functions.Hll]])
    * are max-merged per (month, event_type, bucket) and only then
    * estimated. Max
    * is associative and idempotent, so the re-aggregated month sketch
    * is IDENTICAL to a one-pass month sketch — the oracle computes the
    * one-pass form directly, and the hash match proves mergeability
    * end-to-end, not approximately.
    *
    * Scale shape: the daily pass partially aggregates to ≤ days × 512
    * rows; every later stage is register-table-sized. Any ad-hoc date
    * grain (week, quarter, rolling 30d) re-aggregates the same daily
    * registers without re-touching raw events.
    */
  def monthlyActiveUsers(events: DataFrame): DataFrame = {
    import graft.functions.Hll
    // per-(day, segment) registers — what the nightly job persists
    val daily = events
      .select(to_date(col("ts")).as("day"), col("event_type"),
        Hll.bucket(col("user_id")).as("bucket"),
        Hll.rho(col("user_id")).as("rho"))
      .groupBy("day", "event_type", "bucket").agg(max("rho").as("mrho"))
    val monthly = daily
      .groupBy(date_trunc("month", col("day")).cast("date").as("month"),
        col("event_type"), col("bucket"))
      .agg(max("mrho").as("mrho"))
    val hll = monthly.groupBy("month", "event_type").agg(
      Hll.znAgg(col("mrho")).as("zn"), Hll.vEmptyAgg.as("v_empty"))
    val days = daily.select("day", "event_type").distinct()
      .groupBy(date_trunc("month", col("day")).cast("date").as("month"),
        col("event_type"))
      .agg(count(lit(1)).as("n_days"))
    hll.join(days, Seq("month", "event_type"))
      .select(col("month"), col("event_type"), col("n_days"),
        round(Hll.estimate(col("zn"), col("v_empty")), 4).as("approx_users"))
      .orderBy("month", "event_type")
  }

  /** Sketch aggregates per event type: HyperLogLog distinct users
    * (graft's own deterministic registers) and value quantiles over a
    * deterministic hash sample. At 100 TB these replace exact
    * count-distinct / percentile (whose state is unbounded) with
    * fixed-size mergeable state — the register pass partially
    * aggregates to ≤ types × 512 rows per partition, and the sample
    * bounds the percentile sort to `1/sampleMod` of the stream.
    *
    * Unlike `approx_count_distinct`/`percentile_approx` (whose sketch
    * contents are engine-private), every step here is plain BIGINT
    * arithmetic on the shared avalanche hash ([[SimHash64.mix]]), so
    * the DuckDB oracle replays registers, estimates and sample
    * bit-for-bit and the query is hash-checked like the exact ones.
    * Linear-counting constants (the one transcendental, ln) are
    * computed once here and embedded in the oracle as literals.
    */
  def approxStats(events: DataFrame): DataFrame = {
    import graft.functions.Hll
    val he = Hll.mix31(col("event_id"), 15, 14, 15)
    val rows = events.select(col("event_type"), col("value"),
      Hll.bucket(col("user_id")).as("bucket"),
      Hll.rho(col("user_id")).as("rho"),
      (he % SampleMod === 0).as("sampled"))
    val regs = rows.groupBy("event_type", "bucket")
      .agg(max("rho").as("mrho"))
    val hll = regs.groupBy("event_type").agg(
      Hll.znAgg(col("mrho")).as("zn"), Hll.vEmptyAgg.as("v_empty"))
    val est = Hll.estimate(col("zn"), col("v_empty"))
    val per = rows.groupBy("event_type").agg(
      count(lit(1)).as("n_events"),
      sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sample"),
      percentile(when(col("sampled"), col("value")),
        array(lit(0.5), lit(0.95), lit(0.99))).as("pq"))
    per.join(hll, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        round(est, 4).as("approx_users"),
        col("n_sample"),
        round(element_at(col("pq"), 1), 4).as("p50_value"),
        round(element_at(col("pq"), 2), 4).as("p95_value"),
        round(element_at(col("pq"), 3), 4).as("p99_value"))
      .orderBy("event_type")
  }

  /** Semi-structured extraction: parse the `props` JSON column with a
    * declared schema (`from_json` — no inference pass over the corpus)
    * and aggregate by a derived attribute band. The parse is a per-row
    * codegen'd expression over the scan; one shuffle for the 10-row
    * band aggregate. The oracle replays the extraction with a regex,
    * independently of any JSON machinery.
    */
  def propsBreakdown(events: DataFrame): DataFrame =
    events
      .select(
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        col("value"))
      .groupBy(floor(col("k") / 10).cast("long").as("k_band"))
      .agg(count(lit(1)).as("n_events"),
        min("k").as("min_k"), max("k").as("max_k"),
        (round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .orderBy("k_band")

  /** Gaps-and-islands: per-user consecutive-active-day streaks. The
    * classic pattern — distinct activity days, then `day − row_number`
    * is constant exactly within a consecutive run, so one groupBy
    * collapses each island.
    *
    * Scale shape: one (user, day) distinct shuffle (partial-agg
    * friendly), then a per-user window over day-counts (bounded rows
    * per user: days, not events) — no global window anywhere.
    */
  def activityStreaks(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("__island", date_sub(col("d"), row_number().over(w)))
      .groupBy("user_id", "__island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"),
        sum("len").as("active_days"))
  }

  /** DAU / trailing-7-day WAU / stickiness per day — the engagement
    * dashboard triple, computed EXACTLY. Instead of a 7-day range
    * self-join or a sliding count-distinct window (both funnels), each
    * distinct (day, user) row is pos-exploded into the ≤7 future days
    * it contributes to, and ONE per-day aggregate derives both counts:
    * offset-0 rows are exactly the distinct (day, user) pairs, so
    * their sum is DAU, while WAU is the distinct-user count. Single
    * events scan, fan-out bounded at 7, both shuffles partial-agg
    * friendly. Days whose own DAU is zero are window tails, not
    * observed days — dropped, matching the join the two-pass form
    * would do.
    */
  def dauWau(events: DataFrame): DataFrame =
    events.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .select(col("user_id"),
        posexplode(sequence(col("d"), date_add(col("d"), 6))))
      .groupBy(col("col").as("day"))
      .agg(sum(when(col("pos") === 0, 1L).otherwise(0L)).as("dau"),
        countDistinct("user_id").as("wau"))
      .filter(col("dau") > 0)
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
      .orderBy("day")

  /** Argmax-row retrieval: each user's single highest-value event with
    * its full row — the "latest/largest record per key" pattern. Total
    * order (value DESC, event_id) makes the winner deterministic under
    * value ties; WindowGroupLimit prunes losers map-side so the
    * exchange carries ~1 row per user.
    */
  def topEventPerUser(events: DataFrame): DataFrame =
    events
      .withColumn("__rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("value").desc, col("event_id"))))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))

  /** First-order Markov transition matrix over per-user event
    * sequences: counts and row-normalized probabilities of
    * `prev_type → curr_type` steps — the sequence-modeling prep that
    * also powers next-event prediction baselines and funnel discovery.
    *
    * Scale shape: one user_id exchange for the LAG, then the matrix is
    * |types|²-sized — the per-prev totals broadcast back for the
    * probability column. The probability is a single long/long IEEE
    * division (engine-exact).
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("curr_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("prev_type").agg(sum("n").as("__tot"))
    steps.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("curr_type"), col("n"),
        round(col("n").cast("double") / col("__tot"), 4).as("p"))
      .orderBy("prev_type", "curr_type")
  }

  /** Per-type 3-sigma outliers, decided in EXACT integer arithmetic.
    *
    * Floating z-scores are summation-order-dependent (a distributed
    * stddev and a single-threaded one disagree in the last ulp), so the
    * outlier cut is evaluated as the equivalent integer inequality over
    * cent values:  (v·n − S)² > 9·(n·Q − S²)  with S=Σv, Q=Σv² as
    * BIGINT cent sums and the squares widened to DECIMAL(38,0) — every
    * term exact, so the flag (and therefore the result set) is
    * engine-independent and hash-checks against the oracle's HUGEINT
    * replay. `side` reports the deviation direction.
    *
    * Scale shape: one partial-aggregating shuffle for the 4-row stats
    * table, broadcast back over the scan; the outlier filter itself is
    * a codegen'd per-row predicate.
    */
  def anomalies(events: DataFrame): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val stats = events
      .select(col("event_type"), cents.as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        // each v² fits a long, but Σv² over a 100 TB partition does
        // not — widen the TERMS to decimal(38,0) so the sum is exact
        // at any row count (matching the oracle's HUGEINT)
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("q"))
    val dec = "decimal(38,0)"
    val dev = cents.cast(dec) * col("n").cast(dec) - col("s").cast(dec)
    val varN2 = col("n").cast(dec) * col("q").cast(dec) -
      col("s").cast(dec) * col("s").cast(dec)
    events.join(broadcast(stats), "event_type")
      .filter(dev * dev > varN2 * 9)
      .select(col("event_id"), col("event_type"), col("value"),
        when(dev > 0, lit("high")).otherwise(lit("low")).as("side"))
  }

  /** Robust (median/MAD) outliers per event type — the heavy-tail-safe
    * complement of the 3-sigma [[anomalies]]: mean and stddev are
    * themselves dragged by the outliers they hunt, while the median
    * and the median-absolute-deviation have a 50% breakdown point.
    * Everything stays EXACT: values land in integer cents, the two
    * exact `percentile` medians interpolate to at worst quarter-cent
    * steps — dyadic rationals, exactly representable doubles — and
    * `k` is an integer, so the `dev > k·MAD` cut compares exactly
    * representable numbers and replays bit-for-bit in any engine (the
    * 1.4826 normal-consistency constant is deliberately NOT folded
    * in: it is not exactly representable, and for a fixed cut it is
    * just a relabeling of k).
    *
    * Two broadcast-joined |types|-row aggregates over one re-read of
    * the stream: the exact sort-based percentile shuffles per-type
    * values, the scale knob the sampled [[medianByType]] documents.
    */
  def robustOutliers(events: DataFrame, k: Int = 5): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val typed = events
      .select(col("event_id"), col("event_type"), col("value"), cents.as("__c"))
    val med = typed.groupBy("event_type")
      .agg(percentile(col("__c"), lit(0.5)).as("__med"))
    val dev = typed.join(broadcast(med), "event_type")
      .withColumn("__dev", abs(col("__c") - col("__med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("__dev"), lit(0.5)).as("__mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("__dev") > lit(k) * col("__mad"))
      .select(col("event_id"), col("event_type"), col("value"))
  }

  /** Session-length distribution: how many sessions contain k events —
    * the engagement histogram product teams read daily, and a
    * composition proof: [[sessions]]' output re-aggregated twice
    * (session grain → length grain), each step map-side combined.
    * The sessionizer's one user exchange is the only data-sized
    * shuffle; everything after is histogram-sized.
    */
  def sessionLengthHist(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessions(events, gapMinutes)
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_sessions"),
        // re-integerize the 2-decimal session totals BEFORE summing:
        // a double sum is partition-order-dependent; a long cent sum
        // is exact
        (sum(round(col("total_value") * 100, 0).cast("long")) / 100.0)
          .as("total_value"))
      .orderBy("n_events")

  /** Conversion latency: per user, the time from FIRST signup to the
    * first purchase at-or-after it — the metric the stage-count
    * [[funnel]] deliberately doesn't measure (how LONG conversion
    * takes, not whether it happened). Two user-grain conditional
    * aggregates sharing one user partitioning (the purchase min is
    * conditional on the signup time, so it joins the signup frame
    * co-partitioned rather than forcing a second full window);
    * lag in whole seconds — exact integer arithmetic end to end.
    */
  def conversionLag(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(signups, "user_id")
      .filter(col("ts") >= col("signup_ts"))
      .groupBy("user_id").agg(min("ts").as("purchase_ts"))
    signups.join(purchases, "user_id")
      .select(col("user_id"),
        unix_micros(col("signup_ts")).as("signup_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        (unix_micros(col("purchase_ts")) -
          unix_micros(col("signup_ts"))).as("lag_us"))
  }

  /** Empirical CDF table per event type at integer-cent grain — the
    * calibration/quantile-lookup artifact (cume_dist as a TABLE, not
    * a per-row window): P(V ≤ v) for every observed v. The naive
    * `cume_dist() OVER (PARTITION BY type ORDER BY value)` windows
    * the raw stream with \|types\| partitions — a handful of giant
    * sorted partitions at scale. Collapsing to VALUE grain first
    * bounds the windowed frame by the value domain (≤ cents range ×
    * types) however many events exist, and the running sum over that
    * mart-sized frame is the only window. cdf = cum/n is one double
    * division of exact integers, round 4.
    */
  def valueCdf(events: DataFrame): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val grain = events.select(col("event_type"), cents.as("v"))
      .groupBy("event_type", "v").agg(count(lit(1)).as("n_at"))
    val w = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = grain.groupBy("event_type").agg(sum("n_at").as("__n"))
    grain
      .withColumn("cum", sum("n_at").over(w))
      .join(broadcast(totals), "event_type")
      .select(col("event_type"), col("v"), col("n_at"), col("cum"),
        round(col("cum").cast("double") / col("__n"), 4).as("cdf"))
  }

  /** User-growth accounting: per day, how many users appeared for the
    * FIRST time, and the cumulative user base to date. First-seen day
    * is a user-grain min aggregate (map-side combined); the running
    * total is [[graft.etl.StarSchema.globalPrefixSum]] over the
    * DAY-grain frame — two bounded shuffles and a mart-sized prefix
    * sum, where the naive `count(distinct user) over (order by day)`
    * is an unpartitioned window holding every user id.
    */
  def userGrowth(events: DataFrame): DataFrame = {
    val perDay = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id").agg(min("d").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    graft.etl.StarSchema
      .globalPrefixSum(perDay, Seq("day"), "new_users", "cumulative_users")
      .select("day", "new_users", "cumulative_users")
      .orderBy("day")
  }

  /** Top user paths: the first `k` events of every user's event-time
    * sequence joined into a `a>b>c` path string, counted across the
    * user base — the flow-discovery complement of the fixed-stage
    * [[funnel]]. The rank filter is a per-user top-k, so
    * WindowGroupLimit keeps k rows per user inside the shuffle; the
    * path space is |event types|^k however large the corpus, and the
    * sort_array on a k-bounded array is O(k log k) per user.
    */
  def topPaths(events: DataFrame, k: Int = 3): DataFrame =
    events
      .withColumn("__rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("__rn") <= k)
      .groupBy("user_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__rn"), col("event_type")))),
        s => s.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy("path")
}
