package graft.etl

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class IngestSpec extends SparkSpec {

  private def docRows = Tables(spark, sf(), "documents")
    .orderBy("doc_id").collect().toSeq.map(_.toSeq)

  test("csv round-trip is lossless against the parquet truth") {
    val rt = Ingest.csvRoundTrip(spark, sf()).collect().toSeq.map(_.toSeq)
    assert(rt == docRows)
  }

  test("json round-trip is lossless against the parquet truth") {
    val rt = Ingest.jsonRoundTrip(spark, sf()).collect().toSeq.map(_.toSeq)
    assert(rt == docRows)
  }

  test("quarantine splits one scan into clean rows and raw corrupt lines") {
    val dir = Files.createTempDirectory("graft_quar").toString
    Files.writeString(Paths.get(s"$dir/drop.csv"),
      "doc_id,text,lang,source,n_chars\n" +
        "1,aa bb,en,web,5\n" +
        "not_a_long,cc,en,web,zz\n" +
        "2,dd,en,web,2\n")
    val (clean, bad) =
      Ingest.quarantine(Tables.csv(spark, dir, Ingest.documentsSchema))
    assert(!clean.columns.contains(Tables.CorruptCol))
    assert(clean.select("doc_id").orderBy("doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // Spark refuses a query referencing ONLY the corrupt column —
    // keep the full row and extract the field afterwards.
    val rawBad = bad.collect().map(_.getAs[String](Tables.CorruptCol))
    assert(rawBad.toSeq == Seq("not_a_long,cc,en,web,zz"))
  }
}
