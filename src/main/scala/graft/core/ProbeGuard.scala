package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Fail-soft sizing for FORCED broadcasts of probe-side frames.
  *
  * The persisted-index probes ([[graft.operators.Dedup.minhashProbe]],
  * [[graft.operators.Similarity.embeddingProbe]] /
  * `pqEmbeddingProbe`) force-broadcast the candidate frame into a
  * streaming scan of the index — that is what keeps per-batch cost
  * flat as the corpus grows (INDEX_SCALE.md: the auto-broadcast
  * rollover that silently shuffled the index side was the one 100×
  * scale cliff found by measurement). But a forced `broadcast()` is
  * unconditional: the candidate set is bounded by batch × bucket
  * collisions, NOT by the batch alone, so a duplication-heavy
  * (adversarial) corpus can push it past Spark's 8 GB broadcast /
  * driver-memory hard limit and fail the whole batch where an
  * un-hinted join would have degraded to a shuffle.
  *
  * [[guarded]] makes the degradation explicit and measured instead of
  * accidental: the probe frame is pinned once with `localCheckpoint`
  * (eager — the SAME single pass over the index postings the lazy
  * plan made, now reusable), its exact row count is read off the
  * pinned partitions (cheap — no recompute), and the frame is then
  * either
  *
  *   - `broadcast(...)`-hinted (count ≤ `graft.probe.maxBroadcastRows`,
  *     default 1,000,000): the flat-cost fast path — the index side
  *     streams, nothing corpus-sized shuffles; or
  *   - `hint("shuffle_hash")`-ed (above the threshold): both sides
  *     shuffle on the join key, the pinned probe frame is the build
  *     side. The batch pays collision-proportional shuffle instead of
  *     hard-failing — fail-soft, exactly the old un-hinted behavior
  *     but chosen deliberately and only when the fast path is unsafe.
  *
  * The threshold is in ROWS because the probe payloads differ by call
  * site (a shingle-array row is ~1 KB, an embedding row ~300 B); at
  * the 1M default the worst-case broadcast is ~1 GB — inside the 8 GB
  * limit with headroom for concurrent batches. Tune per deployment via
  * the runtime conf (`spark.conf.set("graft.probe.maxBroadcastRows",
  * ...)`); ProbePlanSpec pins both regimes structurally.
  *
  * Laziness note: calling this RUNS a job (the checkpoint + count) at
  * plan-construction time. The probes are deployed inside
  * `foreachBatch` where plan construction is already per-batch work;
  * the one extra count over pinned partitions is noise next to the
  * index scan itself.
  */
object ProbeGuard {
  val ConfKey = "graft.probe.maxBroadcastRows"
  val DefaultMaxBroadcastRows = 1000000L

  def maxBroadcastRows(df: DataFrame): Long =
    df.sparkSession.conf
      .get(ConfKey, DefaultMaxBroadcastRows.toString).toLong

  def guarded(probeSide: DataFrame): DataFrame = {
    val pinned = probeSide.localCheckpoint()
    if (pinned.count() <= maxBroadcastRows(pinned)) broadcast(pinned)
    else pinned.hint("shuffle_hash")
  }
}
