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
}
