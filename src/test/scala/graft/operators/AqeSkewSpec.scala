package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §4 claims AQE re-plans runtime skew; this pins it actually
  * firing: a hot key that dwarfs every other partition must be split
  * by OptimizeSkewedJoin (skew=true in the final SMJ) instead of one
  * straggler task processing the whole key.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition") {
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0: 200k rows with fat payload; 50 other keys: 100 rows each
      val skewed = spark.range(200000).select(lit(0L).as("k"),
          concat(lit("x" * 64), col("id").cast("string")).as("payload"))
        .unionByName(spark.range(5000).select(
          (col("id") % 50 + 1).as("k"),
          col("id").cast("string").as("payload")))
      val dim = spark.range(51).select(col("id").as("k"),
        concat(lit("name_"), col("id").cast("string")).as("name"))
      val joined = skewed.join(dim, "k").groupBy("name")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val finalPlan = plan.indexOf("== Initial Plan ==") match {
        case -1 => plan
        case i  => plan.substring(0, i)
      }
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
