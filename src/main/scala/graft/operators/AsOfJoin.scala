package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the latest right row
  * of the same key whose time is <= the left row's time.
  *
  * Implemented as the union-and-window pattern rather than a range
  * (theta) join: tag both sides, union, and run one window partitioned
  * by key and ordered by (time, side, tiebreak) carrying the running
  * `last` right payload forward. Right rows sort before left rows at
  * equal timestamps, so "<=" matches; among right ties the largest
  * `rightTiebreak` wins.
  *
  * Scale shape: ONE shuffle (the window partition by key), zero row
  * explosion — compare a naive `l.key = r.key AND r.t <= l.t` join,
  * which Spark can only execute as a per-key cartesian. This is the
  * standard formulation for point-in-time feature lookups at 100 TB.
  */
object AsOfJoin {

  /** @param rightVals      right columns carried onto matching left rows
    *                       (exposed as `prefix`+name)
    * @param rightTiebreak  numeric right column breaking time ties —
    *                       largest wins, making the match deterministic
    * @param prefix         prefix for the attached right columns; the
    *                       right time column is attached too
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, rightVals: Seq[String],
               rightTiebreak: String, prefix: String): DataFrame = {
    val payloadFields = rightTime +: rightVals
    val r = right.select(
      keys.map(col) :+
        col(rightTime).as("__t") :+
        col(rightTiebreak).cast("long").as("__tb") :+
        struct(payloadFields.map(col): _*).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tb", lit(0L))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payloadFields.foldLeft(joined) { (d, f) =>
      d.withColumn(prefix + f, col(s"__last.$f"))
    }.drop("__t", "__tb", "__side", "__rv", "__last")
  }

  /** Forward as-of join: for every left row, attach the EARLIEST right
    * row of the same key whose time is >= the left row's time — the
    * next-scheduled-event lookup ("first purchase at or after each
    * click"). Same union-and-window shape as [[backward]], mirrored:
    * left rows sort before right rows at equal timestamps (so ">="
    * matches a tied right), the frame looks FORWARD, and among right
    * ties the SMALLEST `rightTiebreak` wins.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String, rightVals: Seq[String],
              rightTiebreak: String, prefix: String): DataFrame = {
    val payloadFields = rightTime +: rightVals
    val r = right.select(
      keys.map(col) :+
        col(rightTime).as("__t") :+
        col(rightTiebreak).cast("long").as("__tb") :+
        struct(payloadFields.map(col): _*).as("__rv"): _*)
      .withColumn("__side", lit(1))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tb", lit(0L))
      .withColumn("__side", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(0, Window.unboundedFollowing)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__next", first(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    payloadFields.foldLeft(joined) { (d, f) =>
      d.withColumn(prefix + f, col(s"__next.$f"))
    }.drop("__t", "__tb", "__side", "__rv", "__next")
  }
}
