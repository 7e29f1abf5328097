package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proof that bucketed materialization removes the recurring shuffle:
  * tables bucketed on the join key join with zero exchanges, and
  * aggregations on the bucket key skip the exchange too.
  */
class BucketedSpec extends SparkSpec {

  test("same-bucketed tables join and aggregate with zero exchanges") {
    val fact = WeatherMart.fact(spark, sf())
    Mart.writeBucketed(fact, "fact_bucketed", Seq("location_key"), 4)
    Mart.writeBucketed(
      WeatherMart.dimLocation(spark, sf()), "dim_loc_bucketed",
      Seq("location_key"), 4)
    try {
      // force the shuffle-join path AQE would take at 100 TB scale —
      // broadcast would mask the property under test
      val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      val saved = keys.map(k => k -> spark.conf.getOption(k))
      keys.foreach(spark.conf.set(_, "-1"))
      try {
        val joined = spark.table("fact_bucketed")
          .join(spark.table("dim_loc_bucketed"), "location_key")
        joined.collect()
        val joinPlan = joined.queryExecution.executedPlan.toString
        assert(!joinPlan.contains("Exchange"),
          s"bucketed join still shuffles:\n$joinPlan")

        val agg = spark.table("fact_bucketed")
          .groupBy("location_key").agg(count(lit(1)).as("n"))
        agg.collect()
        val aggPlan = agg.queryExecution.executedPlan.toString
        assert(!aggPlan.contains("Exchange"),
          s"bucket-key aggregation still shuffles:\n$aggPlan")

        // and the bucketed copy is faithful
        assert(spark.table("fact_bucketed").count() == fact.count())
        assert(joined.count() ==
          fact.join(WeatherMart.dimLocation(spark, sf()), "location_key").count())
      } finally saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    } finally Seq("fact_bucketed", "dim_loc_bucketed")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
