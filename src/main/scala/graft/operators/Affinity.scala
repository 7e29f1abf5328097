package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity: which items co-occur in the same order
  * more than their solo popularity predicts — the first (pair) pass
  * of Apriori plus the lift statistic, the classic
  * recommend-with-what analysis a warehouse runs on its order fact.
  */
object Affinity {

  /** Co-ordered part pairs with support and lift.
    *
    * lift = support · n_orders / (n_a · n_b): >1 means the pair
    * co-occurs more than independent popularity predicts. The basket
    * self-join is an equi-join on the order key, so its fan-out is
    * basket-size², bounded by how many DISTINCT items one order
    * holds (single digits in practice) — never corpus-sized; the
    * pair-count aggregate is map-side combined and its result space
    * is ≤ |catalog|² however many orders exist. For heavy-tailed
    * baskets (a "basket" that is really a feed), cap basket size
    * upstream or prune items below `minSupport` FIRST (the Apriori
    * monotonicity: a pair can never out-support its rarer item).
    * All-integer counts; the one float (lift) is a single division
    * of exact integers, identically associated on both engines.
    */
  def basketPairs(lineitem: DataFrame, minSupport: Long = 2L): DataFrame = {
    // the distinct basket frame feeds FOUR consumers (both self-join
    // sides, item counts, the order count); without pinning, each
    // replays the fact scan + distinct — 10 scans of a 100 TB table
    // in the unpinned plan. The pinned frame is itself near
    // fact-ROW-count (distinct barely reduces a real basket table)
    // but column-pruned to two ids (~16 B/row): one materialization
    // of that beats re-reading the wide fact four times
    val items = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
      .distinct()
      .transform(graft.core.Pin.pin(_, eager = false))
    // itemCounts is CATALOG-grain: normally dim-sized, but a 100M-item
    // catalog would hard-fail an unconditional broadcast at the 8 GB
    // limit — so it goes through the same measured fail-soft guard as
    // the index probes (ProbeGuard: broadcast when small, explicit
    // shuffle_hash when not). One guarded pin feeds both join sides.
    // Known tradeoff: the guard counts at CONSTRUCTION time, which
    // forces the `items` pin — so building this plan without running
    // it (explain, speculative composition) already pays the distinct.
    // Every current caller executes the frame immediately; a caller
    // that only composes should pass a pre-guarded itemCounts instead.
    val itemCounts = graft.core.ProbeGuard.guarded(
      items.groupBy("pk").agg(count(lit(1)).as("n_item")))
    val nOrders = items.agg(countDistinct("okey").as("n_orders"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(itemCounts.select(col("pk").as("part_a"),
        col("n_item").as("__na")), "part_a")
      .join(itemCounts.select(col("pk").as("part_b"),
        col("n_item").as("__nb")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("support"),
        round(col("support").cast("double") * col("n_orders") /
          (col("__na") * col("__nb")), 4).as("lift"))
    // no output sort: the pair frame is catalog²-bounded but still
    // scale-proportional — hash-stability ordering lives in the
    // verify ledger (SparkEntry.verifySortKeys), per the r12 doctrine
  }
}
