package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins without a nested-loop explosion.
  *
  * Spark executes a bare `point BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin — every fact row tested against every range.
  * Bucketing turns it into an equi-join: ranges are exploded to the
  * fixed-width buckets they overlap (small side only — a range spanning
  * w buckets emits w rows), facts compute their single bucket id, and
  * the bucket equi-join + residual BETWEEN filter produces exactly the
  * interval matches. At 100 TB the fact side stays a pure scan +
  * broadcast hash join; no shuffle, no cartesian.
  */
object RangeJoin {

  /** Join each fact row to every range containing `pointCol`.
    * `step` is the bucket width — pick it near the typical range width
    * so each range lands in O(1) buckets.
    */
  def pointInRange(facts: DataFrame, pointCol: String, ranges: DataFrame,
                   loCol: String, hiCol: String, step: Double): DataFrame = {
    val expanded = ranges.withColumn("__bkt",
      explode(sequence(
        floor(col(loCol) / step).cast("long"),
        floor(col(hiCol) / step).cast("long"))))
    facts.withColumn("__bkt", floor(col(pointCol) / step).cast("long"))
      .join(broadcast(expanded), Seq("__bkt"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bkt")
  }
}
