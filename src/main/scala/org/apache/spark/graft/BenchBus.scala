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
}
