package graft.etl

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merge one day's delta into a
  * standing rollup instead of rescanning history — the daily-load twin
  * of the reference's full-rebuild aggregates. Correctness contract:
  * merged(state, delta) must be bit-identical to recomputing the rollup
  * over the union of inputs, which is exactly what the oracle checks
  * (it recomputes directly; we merge).
  *
  * Works because the aggregate state is decomposable: counts and BIGINT
  * cent-sums re-add associatively. At scale the state table is
  * months × statuses (tiny) while history is the 100 TB side — the
  * merge reads one day, never history.
  */
object Incremental {

  private def rollup(orders: DataFrame): DataFrame =
    orders.groupBy(
      date_trunc("month", col("o_orderdate")).cast("date").as("month"),
      col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))

  /** Standing state (strictly before `cutoff`) merged with the cutoff
    * day's delta; result covers everything before the next day.
    */
  def mergedMonthlyOrders(spark: SparkSession, dir: String,
                          cutoff: String = "1998-06-15"): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val state = rollup(orders.filter(col("o_orderdate") < lit(cutoff)))
    val delta = rollup(orders.filter(col("o_orderdate") >= lit(cutoff) &&
      col("o_orderdate") < date_add(lit(cutoff).cast("date"), 1)))
    state.unionByName(delta)
      .groupBy("month", "o_orderstatus")
      .agg(sum("n_orders").as("n_orders"), sum("cents").as("cents"))
      .select(col("month"), col("o_orderstatus"), col("n_orders"),
        (col("cents").cast("double") / 100.0).as("total_price"))
      .orderBy("month", "o_orderstatus")
  }

  /** Incremental JOIN-view maintenance (insert-only IVM): the delta
    * rows of the materialized view `A ⋈ B` when both inputs took
    * inserts. The delta algebra
    * `ΔV = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB`
    * covers all three new-match classes exactly once — ΔA×B_old,
    * ΔA×ΔB (inside the first join), A_old×ΔB (the second) — so
    * `V_old ∪ joinDelta(...)` is row-identical to recomputing
    * `(A ∪ ΔA) ⋈ (B ∪ ΔB)` from scratch (spec-pinned).
    *
    * Scale shape: at 100 TB the standing sides A_old/B are the big
    * frames and the deltas are a day's inserts — both joins put a
    * DELTA on one side, so with broadcast-able deltas neither
    * standing side ever shuffles, and the view table itself (the
    * biggest artifact) is only appended to, never rebuilt. Deletes /
    * updates need keyed retraction (the [[graft.etl.Cdc]] compaction
    * shape) before the join — this operator is the insert-only fast
    * path a daily warehouse load actually runs.
    */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame = {
    val newMatches = aDelta.join(bOld.unionByName(bDelta), keys)
    val oldWithNewB = aOld.join(bDelta, keys)
    newMatches.unionByName(oldWithNewB)
  }

  /** Update/delete-aware JOIN-view maintenance — the retraction path
    * [[joinDelta]]'s insert-only contract defers to. Given the STORED
    * view `A ⋈ B`, a CDC feed on A (`seq`/`op` rows, the
    * [[graft.etl.Cdc.applyChanges]] shape) and the static join side
    * `b`, emit the delete-then-insert feed that brings the view
    * current:
    *
    *   - 'D': every stored view row whose A-key appears in the feed
    *     (an updated key's old join rows are stale whatever changed;
    *     a deleted key's rows must go) — a semi-join of the view
    *     against the DISTINCT touched keys;
    *   - 'I': the feed compacted latest-wins (deletes dropped)
    *     re-joined to `b` — the touched keys' fresh join rows.
    *
    * Applying D-then-I by key to the stored view equals recomputing
    * `A' ⋈ B` from scratch (spec). Work is ∝ |feed|: the view is
    * probed by a semi-join on the (broadcast-able) touched-key set
    * and only feed rows shuffle against `b` — the standing 100 TB
    * sides are never re-joined. An update is a retraction pair, not
    * an in-place diff: join fan-out makes per-row updates ambiguous
    * (one A-row maps to many view rows), delete-then-insert is the
    * shape every IVM engine emits.
    */
  def maintainJoinView(view: DataFrame, feed: DataFrame, b: DataFrame,
                       aKey: Seq[String], joinKeys: Seq[String]): DataFrame = {
    val touched = feed.select(aKey.map(col): _*).distinct()
    val retract = view.join(touched, aKey, "left_semi")
      .withColumn("op", lit("D"))
    val fresh = Cdc.applyChanges(feed, aKey).join(b, joinKeys)
      .withColumn("op", lit("I"))
    retract.unionByName(fresh)
  }
}
