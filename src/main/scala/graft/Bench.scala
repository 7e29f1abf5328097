package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are forced through the `noop` sink so the full plan executes
  * (a bare count() lets Spark skip compute on projection-only plans).
  * One cheap warmup query absorbs first-use JVM/codegen costs, and each
  * query runs SPARK_GRAFT_BENCH_ITERS times (default 2) reporting the
  * minimum — steady-state plan cost, not JIT/GC noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup: touch every table + run one small aggregate; a missing
    // table must not kill the run before the JSON line is printed
    graft.core.Tables.All.foreach { t =>
      try force(graft.core.Tables(spark, sfDir, t).limit(1))
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt.max(1)
    // Between queries (outside the timed region) drop every persisted /
    // localCheckpoint'd RDD block. These are otherwise freed only when
    // the driver GCs the RDD reference — across 77 queries × 2 iters the
    // leaked blocks fill the block manager and late queries measure GC
    // thrash instead of their plan (token_count: 23s leaked vs ~0.4s).
    // blocking=true: async removal would storm the block manager while
    // the NEXT query is being timed (orders_monthly_status measured 14s
    // of someone else's cleanup with blocking=false).
    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // optional comma-separated name filter for local iteration; the
    // driver sets no filter and measures everything
    val onlyEnv = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // Rounds are round-robin (all queries once, then all again), NOT
    // back-to-back per query: the host shows minute-scale noise bursts
    // (a query measured 0.2s in one run and 43s in another), and
    // consecutive iterations both land inside a burst. Spreading a
    // query's samples minutes apart lets min() escape it.
    val qs0 = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyEnv.forall(_.contains(n)) }
    val samples = (1 to iters).flatMap { round =>
      qs0.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        dropBlocks()
        System.err.println(f"[bench] round $round $name: $t%.2f")
        name -> t
      }
    }
    val results = qs0.map { case (name, _) =>
      name -> samples.collect { case (n, t) if n == name => t }.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
