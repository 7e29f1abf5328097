package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness for plan auditing: prints formatted plans and wall
  * times for named queries so shuffle/reuse regressions are visible.
  * Not part of the driver contract.
  */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        println(s"========== $name ==========")
        df.explain("formatted")
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[planlab] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    spark.stop()
  }
}
