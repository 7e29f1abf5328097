package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off investigation main; contents change freely, never part of
  * the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("graft_mart_drive").toString
    graft.etl.Mart.materialize(spark, sfDir, out)
    (graft.etl.Mart.DimTables :+ graft.etl.Mart.FactTable).foreach { t =>
      println(s"[scratch] $t rows=${graft.etl.Mart.table(spark, out, t).count()}")
    }
    val pruned = graft.etl.Mart.factBetween(spark, out, "1995-01-01", "1995-12-31")
    println(s"[scratch] fact 1995 rows=${pruned.count()}")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("NO PARTITION FILTERS")
    println(s"[scratch] ${scanLine.trim.take(300)}")

    val events = graft.core.Tables(spark, sfDir, "events")
    val users = events.select(col("user_id")).distinct().limit(50)
      .withColumn("name", concat(lit("u"), col("user_id")))
    val plainCount = events.join(users, Seq("user_id")).count()
    val saltedCount = graft.operators.SkewJoin
      .saltedInner(events, users, Seq("user_id")).count()
    println(s"[scratch] plain=$plainCount salted=$saltedCount match=${plainCount == saltedCount}")

    // dashboard cores over the materialized mart vs inline derivation
    val q1Mart = graft.etl.Dashboard.avgByDate(
      graft.etl.Mart.table(spark, out, graft.etl.Mart.FactTable),
      graft.etl.Mart.table(spark, out, "dim_date")).collect().toSeq
    val q1Inline = graft.etl.Dashboard.avgByDate(spark, sfDir).collect().toSeq
    println(s"[scratch] q1 mart==inline: ${q1Mart == q1Inline} (${q1Mart.size} rows)")
    spark.stop()
  }
}
