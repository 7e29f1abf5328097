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
}
