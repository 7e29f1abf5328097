package graft.etl

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

class MaintenanceSpec extends SparkSpec {

  private def freshTable(parts: Int): String = {
    val dir = Files.createTempDirectory("graft_maint").toString + "/docs"
    // hash-scattered layout: every file spans the whole doc_id range —
    // the worst case for both file counts and footer ranges
    Tables(spark, sf(), "documents").repartition(parts)
      .write.parquet(dir)
    dir
  }

  private def files(dir: String): Seq[String] =
    new java.io.File(dir).listFiles.map(_.getName)
      .filter(f => f.endsWith(".parquet")).toSeq

  private def contents(dir: String) =
    spark.read.parquet(dir).orderBy("doc_id").collect().toSeq

  test("compact merges a small-file table without losing a row") {
    val dir = freshTable(20)
    val before = contents(dir)
    assert(files(dir).size == 20)
    val n = Maintenance.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1 && files(dir).size == 1)
    assert(contents(dir) == before)
  }

  test("clusterBy yields disjoint per-file key ranges (file-skipping layout)") {
    val dir = freshTable(8)
    val before = contents(dir)
    // scattered layout: ranges of different files overlap
    val scattered = Maintenance.fileRanges(spark, dir, "doc_id").sortBy(_._2)
    assert(scattered.sliding(2).exists {
      case Seq(a, b) => b._2 <= a._3; case _ => false
    }, "precondition: hash layout should interleave key ranges")
    // cluster into ~4 files
    val target = math.max(1L, Maintenance.dirBytes(spark, dir) / 4)
    val n = Maintenance.clusterBy(spark, dir, Seq("doc_id"), target)
    assert(n >= 2, s"expected a multi-file clustered table, got $n")
    val ranges = Maintenance.fileRanges(spark, dir, "doc_id").sortBy(_._2)
    ranges.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 > a._3, s"overlapping file ranges after clustering: $a vs $b")
      case _ =>
    }
    assert(contents(dir) == before)
  }

  test("expirePartitions unlinks only the partitions below the cutoff") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_ttl").toString + "/fact"
    Tables(spark, sf(), "lineitem")
      .withColumn("year", year(col("l_shipdate")).cast("long"))
      .write.partitionBy("year").parquet(dir)
    val years = spark.read.parquet(dir)
      .select(col("year").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(years.length >= 3, "precondition: multi-year fact")
    val cutoff = years(1) // expire exactly the oldest year
    val kept = spark.read.parquet(dir)
      .filter(col("year") >= cutoff).orderBy("l_orderkey", "l_linenumber")
      .collect().toSeq

    val expired = Maintenance.expirePartitions(spark, dir, "year", cutoff)
    assert(expired == Seq(s"year=${years.head}"))
    val after = spark.read.parquet(dir)
    assert(after.select(col("year").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.sameElements(years.drop(1)))
    // surviving rows are byte-identical — nothing was rewritten
    assert(after.orderBy("l_orderkey", "l_linenumber").collect().toSeq == kept)
  }
}
