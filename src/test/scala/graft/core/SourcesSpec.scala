package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType)))

  test("csv round-trips with explicit schema and quarantines corrupt rows") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name,price\n1,aa,1.5\n2,bb,2.5\nnot_a_long,cc,oops\n")
    val df = Tables.csv(spark, s"$dir/data.csv", schema).cache()
    val good = df.filter(col(Tables.CorruptCol).isNull)
      .select("id", "name", "price").orderBy("id").collect().toSeq.map(_.toSeq)
    assert(good == Seq(Seq(1L, "aa", 1.5), Seq(2L, "bb", 2.5)))
    assert(df.filter(col(Tables.CorruptCol).isNotNull).count() == 1)
  }

  test("json round-trips with explicit schema and quarantines corrupt rows") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"id":1,"name":"aa","price":1.5}
        |{"id":2,"name":"bb","price":2.5}
        |{"id":broken}
        |""".stripMargin)
    val df = Tables.json(spark, s"$dir/data.json", schema).cache()
    val good = df.filter(col(Tables.CorruptCol).isNull)
      .select("id", "name", "price").orderBy("id").collect().toSeq.map(_.toSeq)
    assert(good == Seq(Seq(1L, "aa", 1.5), Seq(2L, "bb", 2.5)))
    assert(df.filter(col(Tables.CorruptCol).isNotNull).count() == 1)
  }

  test("schema is never inferred: scan carries exactly the declared schema") {
    val dir = Files.createTempDirectory("graft_csv2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name,price\n1,aa,1.5\n")
    val df = Tables.csv(spark, s"$dir/data.csv", schema)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "name", "price", Tables.CorruptCol))
    assert(df.schema("id").dataType == LongType)
  }
}
