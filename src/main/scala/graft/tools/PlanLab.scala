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
    // the materialized-mart read twins (q1m..q5m) live outside
    // SparkEntry.queries (Bench builds them around an untimed
    // materialize); mirror that here so their plans are dumpable too
    val martNames = (1 to 5).map(i => s"q${i}m").toSet
    val martQs: Seq[(String, org.apache.spark.sql.DataFrame)] =
      if (names.intersect(martNames).isEmpty) Seq.empty
      else {
        val martDir =
          System.getProperty("java.io.tmpdir") + "/graft_planlab_mart"
        graft.etl.Mart.materialize(spark, sfDir, martDir)
        import graft.etl.{Dashboard, Mart}
        def mt(n: String) = Mart.table(spark, martDir, n)
        Seq(
          "q1m" -> Dashboard.avgByDate(mt(Mart.FactTable), mt("dim_date")),
          "q2m" -> Dashboard.topNByLocation(mt(Mart.FactTable),
            mt("dim_location"), 15),
          "q3m" -> Dashboard.avgByClass(mt(Mart.FactTable)),
          "q4m" -> Dashboard.bandCounts(mt(Mart.FactTable)),
          "q5m" -> Dashboard.pctPositiveByDate(mt(Mart.FactTable)))
      }
    (graft.SparkEntry.queries.toSeq.map { case (n, f) => n -> (() => f(spark, sfDir)) } ++
      martQs.map { case (n, df) => n -> (() => df) })
      .filter { case (n, _) => names.isEmpty || names(n) }
      .sortBy(_._1)
      .foreach { case (name, fn) =>
        val df = fn()
        println(s"========== $name ==========")
        df.explain("formatted")
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[planlab] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // The formatted plan above is the INITIAL one (AQE not yet
        // run: isFinalPlan=false, join strategies provisional). Run
        // the df's own QueryExecution to completion (the noop write
        // above executed a SEPARATE QueryExecution wrapping the write
        // command) and print what actually ran — AQE's final join
        // strategies, ReusedExchange/AQEShuffleRead nodes — i.e. the
        // shape the optimization claims are about (guide §7.2).
        val qe = df.queryExecution
        qe.toRdd.foreach(_ => ())
        println(s"---------- $name executed (post-AQE) ----------")
        println(qe.executedPlan.toString)
      }
    spark.stop()
  }
}
