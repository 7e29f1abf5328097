package graft.core

import org.apache.spark.sql.DataFrame

/** Pluggable pin strategy for frames whose lineage must be cut —
  * iterative loops ([[graft.operators.Corpus.connectedComponents]]:
  * unbounded lineage), multi-consumer frames
  * ([[graft.operators.Affinity.basketPairs]]: four consumers of one
  * expensive distinct), and the probe-side frames [[ProbeGuard]]
  * sizes.
  *
  * `localCheckpoint` is the right default at local[32] and on static
  * clusters: it materializes to executor block storage with no
  * distributed-filesystem round-trip. But its blocks live ON the
  * executors — on a 1000-executor cluster with dynamic allocation, one
  * decommissioned executor loses its blocks and FAILS the job instead
  * of recomputing (localCheckpoint truncates lineage, so there is
  * nothing to recompute from). Deployments in that regime set
  *
  *   spark.conf.set("graft.pin.mode", "reliable")
  *   spark.sparkContext.setCheckpointDir("hdfs://…/checkpoints")
  *
  * and every pin in the library becomes a reliable `checkpoint()` to
  * the fault-tolerant checkpoint dir instead — same lineage cut, same
  * results (PinModeSpec runs the CC loop under both modes and asserts
  * identical labels), survivable executor loss. The mode is read per
  * call, so a session can flip it between jobs.
  */
object Pin {
  val ConfKey = "graft.pin.mode"
  val Local = "local"
  val Reliable = "reliable"

  def mode(df: DataFrame): String =
    df.sparkSession.conf.get(ConfKey, Local)

  /** Cut `df`'s lineage under the session's pin mode. `eager = false`
    * defers materialization to the first action (the multi-consumer
    * pattern where the first consumer pays the build either way).
    */
  def pin(df: DataFrame, eager: Boolean = true): DataFrame =
    mode(df) match {
      case Reliable =>
        require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          s"$ConfKey=$Reliable requires sparkContext.setCheckpointDir(...)")
        df.checkpoint(eager)
      case Local => df.localCheckpoint(eager)
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be '$Local' or '$Reliable' (got '$other')")
    }
}
