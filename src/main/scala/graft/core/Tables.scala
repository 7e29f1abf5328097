package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single place that knows how driver test tables are stored.
  *
  * At 100 TB the only change needed is here: point at the warehouse
  * (bucketed tables / a catalog) instead of loose parquet files. Every
  * operator downstream is declarative, so partition pruning, predicate
  * pushdown and column pruning flow through Catalyst unchanged.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
