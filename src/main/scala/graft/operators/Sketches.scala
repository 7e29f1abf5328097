package graft.operators

import graft.functions.{GraftFunctions, MinHashSig, SimHash64}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch: frequency estimation in FIXED executor state —
  * the counting analog of the HLL cardinality sketch already in the
  * events surface.
  *
  * Why it exists at 100 TB: an exact `groupBy(word)` holds the LOCAL
  * vocabulary of every partition in its hash-aggregate state — on web
  * text that is millions of keys per executor before the shuffle even
  * starts. The CMS caps state at depth×width cells per partition
  * (4×2048 longs = 64 KB here) no matter how large the vocabulary
  * grows, the shuffle moves at most depth×width rows per partition,
  * and two sketches MERGE by plain cell-wise addition — the same
  * mergeability contract the streaming HLL spec pins, so per-batch /
  * per-day sketches roll up losslessly.
  *
  * Estimates are upward-biased, never under: est(w) = min over rows of
  * the row's cell count ≥ true count, within ε·N with probability
  * 1−δ for width = e/ε, depth = ln(1/δ).
  *
  * Hashing is the repo's portable family — per-word Horner+avalanche
  * ([[graft.functions.StringHash31]], the shingle hash as a scalar)
  * fed through the [[MinHashSig]] affine permutations, one per sketch
  * row, everything BIGINT-safe — so the DuckDB oracle replays the
  * sketch cell-for-cell and the estimates hash-check exactly.
  */
object Sketches {

  final val Mod = SimHash64.Mod // 2^31 - 1

  /** Per-row CMS bucket for an avalanched 31-bit hash `x`:
    * ((a_i·x + b_i) mod M) & (width−1). Affine coefficients are the
    * deterministic MinHash family, so depth rows are pairwise
    * independent and oracle-replayable. `width` must be a power of 2.
    */
  def bucket(x: Column, row: Int, width: Int): Column =
    ((lit(MinHashSig.coeffA(row)) * x + lit(MinHashSig.coeffB(row))) % lit(Mod))
      .bitwiseAND(lit(width - 1L))

  private def requirePow2(width: Int): Unit =
    require(width > 0 && (width & (width - 1)) == 0,
      s"CMS width must be a power of 2, got $width")

  /** A built sketch: the `(row, bucket, cnt)` cell frame BOUND to the
    * depth/width it was hashed at. Estimating with a different
    * geometry than the build hashes queries into different buckets —
    * the left join misses and reports 0 for items inserted thousands
    * of times, silently breaking the "never underestimates"
    * guarantee — so the geometry travels with the cells (the same
    * bind-the-width rationale as [[QualityModel.Model]]). `cells`
    * round-trips through parquet: persist it and rebind with the
    * same constructor.
    */
  final case class Cms(cells: DataFrame, depth: Int, width: Int)

  /** Build the sketch from a frame of items (column `item`): one scan,
    * a depth-way inline expand of 16-byte (row, bucket) pairs, then a
    * map-side-combined count per cell. The cell frame is at most
    * depth×width rows regardless of input size.
    */
  def cmsSketch(items: DataFrame, item: String = "item",
                depth: Int = 4, width: Int = 2048): Cms = {
    requirePow2(width)
    val x = GraftFunctions.stringHash31(col(item))
    Cms(items
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), bucket(x, i, width).as("bucket"))): _*))
        .as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt")), depth, width)
  }

  /** Merge sketches built over disjoint slices: cell-wise addition.
    * Lossless by construction (counts are linear); the spec proves
    * merged == one-pass exactly. All inputs must share one geometry —
    * cells from different (depth, width) are not comparable.
    */
  def cmsMerge(sketches: Cms*): Cms = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    require(sketches.forall(s => s.depth == sketches.head.depth
      && s.width == sketches.head.width),
      "cannot merge sketches of different geometry")
    Cms(sketches.map(_.cells).reduce(_.unionByName(_))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt")),
      sketches.head.depth, sketches.head.width)
  }

  /** Point-estimate the counts of `queries` (column `item`) against a
    * sketch: re-hash each query item to its depth cells — the
    * geometry comes from the sketch, so build and probe can never
    * disagree — join the (depth×width)-row cell frame (broadcast-
    * sized by construction) and take the min across rows. Items
    * hitting an untouched cell (never inserted, no collisions)
    * estimate 0 via the coalesce.
    */
  def cmsEstimate(sketch: Cms, queries: DataFrame,
                  item: String = "item"): DataFrame = {
    val x = GraftFunctions.stringHash31(col(item))
    val cells = queries
      .select(col(item), explode(array((0 until sketch.depth).map(i =>
        struct(lit(i).as("row"),
          bucket(x, i, sketch.width).as("bucket"))): _*))
        .as("cell"))
      .select(col(item), col("cell.row").as("row"), col("cell.bucket").as("bucket"))
    cells
      .join(broadcast(sketch.cells), Seq("row", "bucket"), "left")
      .groupBy(item)
      // an unmatched cell is a ZERO counter, not a missing sample:
      // min must see it as 0 (min() alone would skip the NULL and
      // overestimate an item that was never inserted)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** Heavy hitters with sketch cross-check: the exact top-k words by
    * corpus frequency (TakeOrdered — k rows leave each partition)
    * alongside their CMS estimates, proving est ≥ exact cell-for-cell
    * against the oracle. The exact side exists to VERIFY the sketch at
    * test scale; the 100 TB deployment keeps only the sketch + a
    * per-partition candidate heap.
    */
  def heavyHitters(docs: DataFrame, k: Int = 20,
                   depth: Int = 4, width: Int = 2048): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col("text"))).as("item"))
      .filter(length(col("item")) > 0)
    val exact = words.groupBy("item").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("item")).limit(k)
    val sketch = cmsSketch(words, depth = depth, width = width)
    exact.join(cmsEstimate(sketch, exact.select("item")), Seq("item"))
      .select(col("item").as("word"), col("n_exact"), col("n_est"))
      .orderBy(col("n_exact").desc, col("word"))
  }

  // ---------------------------------------------------------------
  // Quantile sketch — the third member of the sketch trio (HLL
  // counts distincts, CMS counts frequencies, this one ranks).
  // ---------------------------------------------------------------

  /** Default per-group sample size: 512 rows ≈ ±2.2% rank error at
    * 95% confidence (1.96/(2√k)), the same "small enough to
    * broadcast, tight enough to train on" point the HLL's 512
    * registers sit at.
    */
  final val QsK = 512

  /** The sketch's per-row rank: the deterministic 31-bit avalanche of
    * the row's unique id — the SAME family (and shift triple) as
    * [[graft.operators.Sessionize]]'s quantile sample, so the DuckDB
    * oracle replays it with the existing mix fragment. Content-
    * derived ⇒ stable under re-partitioning and re-ingestion.
    */
  def qsRank(rowId: Column): Column =
    graft.functions.Hll.mix31(rowId, 15, 14, 15)

  /** FIXED-SIZE deterministic mergeable quantile sketch: per group,
    * the `k` rows with the smallest (avalanche-hash(rowId), rowId) —
    * a bottom-k (KMV-style) uniform row sample under a total order.
    *
    * Why this beats a fixed-FRACTION hash sample at 100 TB: 1/8 of a
    * growing stream still grows — the per-group state that finally
    * merges the percentile is unbounded. Bottom-k state is k rows per
    * group FOREVER, and the plan enforces it end-to-end: the rank
    * filter is WindowGroupLimit on both sides of the exchange, so
    * each map task ships only its local bottom-k per group and the
    * shuffle carries ≤ k×groups rows, never the stream (plan-audited
    * in SketchesSpec).
    *
    * Deterministic (no RNG — the hash IS the permutation), EXACTLY
    * mergeable: bottom-k of a union under a total order == bottom-k
    * of bottom-k's, so [[quantileMerge]] over any partitioning of the
    * rows reproduces the one-pass sketch row-for-row (spec-pinned,
    * the HLL merge doctrine). Groups with ≤ k rows keep ALL their
    * rows — the sketch degrades to exact, so no tiny-group fallback
    * is ever needed.
    *
    * `rowId` must be row-unique (it is the tiebreak making the order
    * total and duplicates of a value sampled independently); `k` must
    * match across sketches that will merge.
    */
  def quantileSketch(df: DataFrame, group: Seq[String], value: Column,
                     rowId: Column, k: Int = QsK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group.map(col): _*)
      .orderBy(col("__qh"), col("__qid"))
    df.select(group.map(col) :+ value.as("__qv") :+
        qsRank(rowId).as("__qh") :+ rowId.as("__qid"): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Merge sketches built over disjoint row slices: bottom-k of the
    * union, re-ranked by the SAME total order the build used (the
    * hash and id travel in the sketch rows, so no re-hashing and no
    * drift). Input frames must share `group` schema and `k`.
    */
  def quantileMerge(group: Seq[String], k: Int, sketches: DataFrame*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sketches.nonEmpty, "quantileMerge needs at least one sketch")
    val w = Window.partitionBy(group.map(col): _*)
      .orderBy(col("__qh"), col("__qid"))
    sketches.reduce(_.unionByName(_))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Quantile estimates from a sketch: linear interpolation over each
    * group's sample (Spark `percentile` == DuckDB `quantile_cont`,
    * interpolation parity verified by the events_median oracle). One
    * aggregate over a ≤ k×groups frame — broadcast-sized output.
    * `qs` = (output column, quantile) pairs; estimates round to 4
    * decimals (the repo's float display doctrine).
    */
  def quantileEstimate(sketch: DataFrame, group: Seq[String],
                       qs: Seq[(String, Double)]): DataFrame =
    sketch.groupBy(group.map(col): _*)
      .agg(count(lit(1)).as("n_sample"),
        qs.map { case (name, q) =>
          round(percentile(col("__qv"), lit(q)), 4).as(name)
        }: _*)
}
