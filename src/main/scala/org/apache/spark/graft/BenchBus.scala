package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Access shim for the private[spark] listener bus — the bench's
  * shuffle-byte attribution must flush pending task-end events before
  * snapshotting its counters, or a query's last tasks could be
  * credited to the next query. Lives in an org.apache.spark
  * subpackage purely for access (the
  * [[org.apache.spark.sql.graft.Bridge]] precedent); contains no
  * Spark-internal logic.
  */
object BenchBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Total bytes currently on the executor's spark.local.dir tree —
    * shuffle files, spilled blocks, disk-cached RDD blocks. The bench
    * logs this between queries: shuffle files are only deleted when
    * the driver GCs their ShuffleDependency (ContextCleaner), so a
    * long multi-query run that never GCs accumulates every query's
    * shuffle output on disk (the VERDICT r13 #3 run-state-leak
    * suspect). private[spark] access is why this lives here.
    */
  def localDirBytes(sc: SparkContext): Long = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) return -1L
    env.blockManager.diskBlockManager.localDirs.map { d =>
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(d)
    }.sum
  }

  /** Deterministically free every registered shuffle's map outputs —
    * the disk half of the run-state leak the GC sweep could not reach
    * at sf10 (VERDICT r14 #2: ~12 GB of local-dir shuffle files
    * survived System.gc between queries, and dedup_minhash_lsh read
    * 428 s in-run vs 108.55 s isolated behind them). ContextCleaner
    * frees a shuffle only when the driver GCs its ShuffleDependency;
    * a bench loop holding plan references in locals defeats that.
    * This replays exactly what ContextCleaner.doCleanupShuffle does —
    * BlockManagerMaster.removeShuffle (deletes the files, blocking)
    * then MapOutputTrackerMaster.unregisterShuffle — but on EVERY
    * currently-registered shuffle id, synchronously, between queries.
    * Safe only at a query boundary: nothing may still want to READ
    * these map outputs (the bench clears the cache first, and AQE
    * shuffle reuse never spans two separate query executions).
    */
  def drainShuffles(sc: SparkContext): Int = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) return 0
    env.mapOutputTracker match {
      case m: org.apache.spark.MapOutputTrackerMaster =>
        val ids = m.shuffleStatuses.keySet.toSeq
        ids.foreach { id =>
          env.blockManager.master.removeShuffle(id, true)
          m.unregisterShuffle(id)
        }
        ids.size
      case _ => 0
    }
  }
}
