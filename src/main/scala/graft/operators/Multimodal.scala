package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed metadata, decoded partition-by-partition.
  *
  * The Spark-side mechanics here are real and load-bearing at 100 TB:
  *  - payloads travel as a `binary` column next to typed metadata;
  *  - decode runs via `mapPartitions` so a real decoder would be
  *    initialized once per partition (codec handles, GPU context) and fed
  *    batches, exactly like a Pandas-UDF/mapInPandas pipeline;
  *  - the decoder's output schema is explicit and stable.
  *
  * The decode itself is a STUB — this container has no image/audio
  * codecs. `decodeStub` derives deterministic fake dimensions from the
  * payload bytes; swap its body for the real codec call in production.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Wrap documents as (doc_id, format, payload) — the shape a media
    * table has: metadata columns + one opaque binary column.
    */
  def asPayloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("png"), lit("jpg"), lit("wav")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("payload"))

  /** ===== STUB geometry constants ===== shared by [[decodeStub]] and
    * the Column-expression twins in [[frameSample]]/[[resizePlan]] —
    * change the fake geometry here and every consumer stays in sync.
    */
  private val DimBase = 64L
  private val DimMod = 448L
  private val HeightMul = 7L
  private val FramesMod = 30L

  /** ===== STUB ===== deterministic fake "decode" of one payload.
    * A real implementation calls the codec here (and only here).
    */
  private def decodeStub(docId: Long, format: String, payload: Array[Byte])
      : (Long, Long, Long) = {
    val len = payload.length.toLong
    val width = DimBase + len % DimMod
    val height = DimBase + (len * HeightMul) % DimMod
    val frames = 1L + docId % FramesMod
    (width, height, frames)
  }

  /** Exact media dedup by payload content hash, per format — the
    * first pass every image/audio corpus runs before any perceptual
    * matching: identical bytes are identical media regardless of
    * filename or crawl source. One hash-groupBy over the binary
    * column (the md5 runs where the payload already is — no payload
    * bytes ever shuffle, only 16-byte hashes), keeper = min doc_id,
    * exactly [[Dedup.exact]]'s shape lifted onto binary payloads.
    */
  def payloadDedup(docs: DataFrame): DataFrame =
    asPayloads(docs)
      .groupBy(col("format"), md5(col("payload")).as("content_hash"))
      .agg(min("doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Frame sampling: every `stride`-th frame of each payload as its own
    * row, with the frame's bytes sliced out of the binary column.
    *
    * The Spark-side plumbing is the real thing at 100 TB: a 1→N explode
    * whose per-row count comes from metadata (never a collect), binary
    * slicing via `Column.substr` on the payload, and a content hash per
    * frame — the shape a video→training-frames pipeline has. Frame
    * BOUNDARIES are the stub (fixed-size slices from the fake
    * n_frames); a real demuxer replaces only the boundary computation.
    */
  def frameSample(docs: DataFrame, stride: Int = 5): DataFrame = {
    val p = asPayloads(docs)
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("n_frames", lit(1L) + pmod(col("doc_id"), lit(FramesMod)))
      .withColumn("frame_len",
        greatest(floor(col("byte_len") / col("n_frames")).cast("long"), lit(1L)))
    p.select(col("doc_id"), col("payload"), col("frame_len"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("payload").substr(
          (col("frame_idx") * col("frame_len") + 1).cast("int"),
          col("frame_len").cast("int"))).as("frame_md5"))
  }

  /** Resize/thumbnail planning: fit each decoded payload into a
    * `box`×`box` target preserving aspect ratio. This is the metadata
    * half a resize stage really computes — target geometry, scaled
    * output-size estimate, and the deterministic content tag a
    * cache/shard layer keys on — in pure integral arithmetic (`DIV`,
    * no floats), so it replays exactly in any engine. The pixel
    * resample itself belongs in the per-partition decoder (stubbed,
    * like [[extract]]'s decode); upscaling is never planned
    * (max-dim ≤ box keeps the original geometry).
    */
  def resizePlan(docs: DataFrame, box: Int = 224): DataFrame = {
    val p = asPayloads(docs)
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("width", lit(DimBase) + pmod(col("byte_len"), lit(DimMod)))
      .withColumn("height",
        lit(DimBase) + pmod(col("byte_len") * HeightMul, lit(DimMod)))
      .withColumn("__mx", greatest(col("width"), col("height")))
      .withColumn("target_w",
        when(col("__mx") <= box, col("width"))
          .otherwise(greatest(expr(s"width * $box DIV __mx"), lit(1L))))
      .withColumn("target_h",
        when(col("__mx") <= box, col("height"))
          .otherwise(greatest(expr(s"height * $box DIV __mx"), lit(1L))))
      .withColumn("n_bytes_est",
        expr("byte_len * (target_w * target_h) DIV (width * height)"))
    p.select(col("doc_id"), col("format"), col("width"), col("height"),
        col("target_w"), col("target_h"), col("n_bytes_est"),
        md5(col("payload").substr(lit(1), col("n_bytes_est").cast("int")))
          .as("thumb_md5"))
  }

  /** Decode payloads to typed metadata, one decoder per partition. */
  def extract(spark: SparkSession, docs: DataFrame): DataFrame = {
    val payloads = asPayloads(docs)
    val enc = RowEncoder.encoderFor(metaSchema)
    payloads
      .mapPartitions { rows =>
        // real pipeline: initialize the codec ONCE here, then stream rows
        rows.map { r =>
          val docId = r.getLong(0)
          val format = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val (w, h, f) = decodeStub(docId, format, payload)
          Row(docId, format, payload.length.toLong, w, h, f)
        }
      }(enc)
  }
}
