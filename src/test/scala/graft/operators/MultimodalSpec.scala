package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload plumbing: binary column + deterministic stub metadata") {
    val docs = Seq((0L, "hello"), (1L, "worldworld")).toDF("doc_id", "text")
    val payloads = Multimodal.asPayloads(docs).collect()
    assert(payloads.head.getAs[Array[Byte]]("payload").toSeq ==
      "hello".getBytes("UTF-8").toSeq)
    assert(payloads.map(_.getAs[String]("format")).toSeq == Seq("png", "jpg"))

    val out = Multimodal.extract(spark, docs).collect()
    assert(out.map(_.schema.fieldNames.toSeq).head ==
      Multimodal.metaSchema.fieldNames.toSeq)
    val r0 = out.head
    assert(r0.getAs[Long]("byte_len") == 5L)
    assert(r0.getAs[Long]("width") == 64L + 5L % 448L)
    assert(r0.getAs[Long]("height") == 64L + 35L % 448L)
    assert(r0.getAs[Long]("n_frames") == 1L)
  }

  test("frameSample slices stride-th frames with correct boundaries") {
    // doc_id 7 -> n_frames = 8, text of 40 chars -> frame_len = 5,
    // stride 5 -> sampled frames 0 and 5
    val text = "abcdefghij" * 4
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val out = Multimodal.frameSample(docs, stride = 5).collect()
    assert(out.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 5L))
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("frame_md5") == hex(text.substring(0, 5)))
    assert(out(1).getAs[String]("frame_md5") == hex(text.substring(25, 30)))
  }

  test("resizePlan fits in the box preserving aspect, never upscales") {
    // 100 chars -> width 64+100%448=164, height 64+700%448=316:
    // mx=316 > 224 -> target_w = 164*224 div 316 = 116, target_h = 224
    val big = Seq((1L, "x" * 100)).toDF("doc_id", "text")
    val b = Multimodal.resizePlan(big).collect().head
    assert(b.getAs[Long]("width") == 164L && b.getAs[Long]("height") == 316L)
    assert(b.getAs[Long]("target_w") == 116L && b.getAs[Long]("target_h") == 224L)
    // byte estimate scales by pixel ratio: 100 * (116*224) div (164*316)
    assert(b.getAs[Long]("n_bytes_est") == 100L * (116L * 224L) / (164L * 316L))

    // 50 chars -> width 114, height 64+350%448=414 -> still > 224; a
    // doc small on BOTH axes (needs len%448 and 7*len%448 <= 160) :
    // len=448 -> width 64, height 64 -> no resize, full-payload hash
    val small = Seq((2L, "y" * 448)).toDF("doc_id", "text")
    val s = Multimodal.resizePlan(small).collect().head
    assert(s.getAs[Long]("target_w") == 64L && s.getAs[Long]("target_h") == 64L)
    assert(s.getAs[Long]("n_bytes_est") == 448L)
  }
}
