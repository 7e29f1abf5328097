package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (UTC, small shuffle count). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Executes `df` and asserts no FILE scan in its plan reads a `text`
    * column — the shared audit for probe-an-index-not-the-corpus
    * operators (in-memory batch scans don't appear as ReadSchema).
    */
  def assertNoTextScan(df: org.apache.spark.sql.DataFrame): Unit = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.nonEmpty, s"expected parquet index scans in:\n$plan")
    schemas.foreach(s => assert(!s.contains("text"),
      s"plan reads a text column ($s):\n$plan"))
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // saveAsTable (bucketed-table specs) must not litter the repo
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()
}
