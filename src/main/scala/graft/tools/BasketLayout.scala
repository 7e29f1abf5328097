package graft.tools

import org.apache.spark.sql.SparkSession

/** Quantifies basket_pairs' file-layout sensitivity (VERDICT r14 #4):
  * the r14 rows-proportional ScaleUp rewrite round-robins rows across
  * files, scattering each order's lineitems — the okey self-join lost
  * the accidental input clustering the old layout gave it (r13
  * measured 243 s on clustered vs 350 s on round-robin at sf10).
  * This tool measures the SAME query on both layouts: the clustered
  * side is a [[graft.etl.Maintenance.clusterBy]](l_orderkey) copy of
  * the substrate's lineitem — literally that operator's use case.
  *
  * Usage:
  *   runMain graft.tools.BasketLayout build   <sfDir> <clusteredDir>
  *   runMain graft.tools.BasketLayout measure <lineitemDir> [label]
  *
  * `build` copies sfDir/lineitem.parquet and clusters it in place;
  * `measure` times basketPairs over one layout in a fresh JVM and
  * prints a JSON line.
  */
object BasketLayout {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "build" =>
        val (sfDir, outDir) = (args(1), args(2))
        // copy-then-cluster: clusterBy swaps in place, so work on the copy
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .write.mode("overwrite").parquet(outDir)
        val files = graft.etl.Maintenance.clusterBy(
          spark, outDir, Seq("l_orderkey"))
        System.err.println(s"[basketlayout] clustered into $files files")
      case "measure" =>
        val dir = args(1)
        val label = if (args.length > 2) args(2) else dir
        val li = spark.read.parquet(dir)
        val shufP = graft.core.Tuning.shufflePartitions(
          li.count(), cpus.toInt)
        spark.conf.set("spark.sql.shuffle.partitions", shufP.toString)
        System.err.println(s"[basketlayout] shuffle partitions: $shufP")
        val t0 = System.nanoTime()
        val rows = graft.operators.Affinity.basketPairs(li).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"layout": "$label", "dir": "$dir", """ +
          f""""rows": $rows, "sec": $sec%.2f}""")
    }
    spark.stop()
  }
}
