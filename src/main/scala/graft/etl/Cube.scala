package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional aggregation surface: pivot and rollup.
  *
  * Scale notes: the pivot takes an EXPLICIT value list — Spark's
  * two-argument `pivot` otherwise runs a distinct-collect job over the
  * pivot column before planning, which is a full extra pass at 100 TB
  * (and nondeterministic column order). With explicit values the whole
  * thing is one partial-aggregating shuffle, exactly like a groupBy.
  * The rollup is likewise a single exchange: Spark expands grouping
  * sets map-side, so partial aggregation still applies.
  */
object Cube {

  /** One row per user, one count column per event type (explicit
    * `types` list, never inferred).
    */
  def eventsPivot(events: DataFrame, types: Seq[String]): DataFrame = {
    val p = events.groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(p) { (d, t) =>
      d.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t)
    }.orderBy("user_id")
  }

  /** Revenue rollup over the location hierarchy region ⊃ nation:
    * per-nation rows, per-region subtotals, and a grand total, with
    * explicit grouping flags (g_* = 1 when that level is rolled up).
    *
    * Expressed as HIERARCHICAL RE-AGGREGATION, not `Dataset.rollup`:
    * the fact shuffles ONCE to the finest (nation) level, and the
    * region/grand levels re-aggregate that dimension-sized result.
    * `rollup`'s Expand node would instead emit 3 copies of every fact
    * row into the exchange — 3× the shuffle volume at 100 TB. (It also
    * false-positives Spark 4.1's ambiguous-self-join detector when the
    * grouping keys come from a join.) count/sum re-aggregate losslessly;
    * revenue accumulates in exact cent BIGINTs (per-row cents are exact
    * on cents-grain money), so the subtotal/grand sums are
    * order-independent at ANY scale — a double sum over 10⁸+ rows
    * drifts past the half-cent and flips the rounded output between
    * engines/runs; a long sum of cents cannot.
    */
  def salesRollup(lineitem: DataFrame, supplier: DataFrame,
                  nation: DataFrame, region: DataFrame): DataFrame = {
    val fine = fineAgg(lineitem, supplier, nation, region)
    nationLevel(fine)
      .unionByName(regionLevel(fine))
      .unionByName(grandTotal(fine))
      .orderBy(col("g_region"), col("g_nation"),
        coalesce(col("region_name"), lit("")),
        coalesce(col("nation_name"), lit("")))
  }

  /** CUBE over (region, nation): all four grouping combinations — the
    * rollup levels plus the nation-only marginal, ALL re-aggregated
    * from the same single fact shuffle (the fine exchange is reused by
    * every level).
    */
  def salesCube(lineitem: DataFrame, supplier: DataFrame,
                nation: DataFrame, region: DataFrame): DataFrame = {
    val fine = fineAgg(lineitem, supplier, nation, region)
    val nationOnly = fine.groupBy("nation_name")
      .agg(sum("__n").as("n_items"), sum("__s").as("__s"))
      .select(lit(null).cast("string").as("region_name"), col("nation_name"),
        lit(1L).as("g_region"), lit(0L).as("g_nation"),
        col("n_items"), centsToDollars(col("__s")).as("revenue"))
    nationLevel(fine)
      .unionByName(regionLevel(fine))
      .unionByName(nationOnly)
      .unionByName(grandTotal(fine))
      .orderBy(col("g_region"), col("g_nation"),
        coalesce(col("region_name"), lit("")),
        coalesce(col("nation_name"), lit("")))
  }

  private def fineAgg(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem.select(col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_regionkey"),
        col("n_name").as("nation_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"),
        col("r_name").as("region_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("region_name", "nation_name")
      .agg(count(lit(1)).as("__n"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("__s"))

  /** Exact cents → dollars: bit-identical in any engine (long→double
    * cast and one IEEE division, both exactly rounded).
    */
  private def centsToDollars(c: Column): Column = c.cast("double") / 100.0

  // null-safe ordering everywhere: Spark sorts nulls first, DuckDB
  // last — the levels coalesce names to '' in their ORDER BY instead

  private def nationLevel(fine: DataFrame): DataFrame = fine.select(
    col("region_name"), col("nation_name"),
    lit(0L).as("g_region"), lit(0L).as("g_nation"),
    col("__n").as("n_items"), centsToDollars(col("__s")).as("revenue"))

  private def regionLevel(fine: DataFrame): DataFrame = fine
    .groupBy("region_name")
    .agg(sum("__n").as("n_items"), sum("__s").as("__s"))
    .select(col("region_name"), lit(null).cast("string").as("nation_name"),
      lit(0L).as("g_region"), lit(1L).as("g_nation"),
      col("n_items"), centsToDollars(col("__s")).as("revenue"))

  private def grandTotal(fine: DataFrame): DataFrame = fine
    .agg(sum("__n").as("n_items"), sum("__s").as("__s"))
    .select(lit(null).cast("string").as("region_name"),
      lit(null).cast("string").as("nation_name"),
      lit(1L).as("g_region"), lit(1L).as("g_nation"),
      col("n_items"), centsToDollars(col("__s")).as("revenue"))
}
