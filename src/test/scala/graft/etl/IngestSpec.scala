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

  test("readEvolved: pre-evolution files surface added columns with " +
       "defaults; evolved rows keep their values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // vintage files: (id, name); later producer adds (score, tag)
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9L, "new")).toDF("id", "name", "score", "tag")
      .write.mode("append").parquet(dir)

    val got = Ingest.readEvolved(spark, dir,
      Map("score" -> 0L, "tag" -> "legacy"))
      .select("id", "name", "score", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getString(3))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 0L, "legacy"), (2L, "b", 0L, "legacy"),
      (3L, "c", 9L, "new")), s"evolved read wrong: $got")

    // a plain (mergeSchema-less) read of the same dir may or may not
    // see the new columns depending on which footer wins — the
    // evolved read is the only deterministic contract
    val plain = spark.read.parquet(dir)
    assert(plain.columns.contains("id"))
  }
}
