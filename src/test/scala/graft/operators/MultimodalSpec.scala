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
}
