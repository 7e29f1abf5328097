package graft.etl

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Extract side of the ELT: file-drop ingestion with an explicit schema
  * and corrupt-row quarantine (the reference ingests CSV drops into its
  * staging layer; re-expressed as Spark DataFrameReader sources).
  *
  * The contract queries are ROUND-TRIPS: parquet truth → write
  * CSV/JSON → schema'd quarantining read → rows. The oracle reads the
  * parquet directly, so a hash match proves the writer+reader pair is
  * lossless AND that nothing landed in quarantine. At 100 TB the code
  * is unchanged — a schema'd multi-file scan parallelizes per file
  * split, and the quarantine split is a narrow filter (no shuffle);
  * only the round-trip staging dir becomes a real landing bucket.
  */
object Ingest {

  /** Documents as they arrive in file drops — explicit, never inferred
    * (inference is an extra full pass and silently re-types drifting
    * columns; see Tables.csv/json).
    */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val docCols = documentsSchema.fieldNames.map(col).toSeq

  /** Split a quarantining read into (clean rows, quarantined raw rows).
    * Both sides are narrow filters over one scan — no shuffle, and at
    * cluster scale the two sinks stream from the same pass.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(Tables.CorruptCol).isNull).drop(Tables.CorruptCol),
    df.filter(col(Tables.CorruptCol).isNotNull))

  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_ingest_csv").toString
    Tables(spark, dir, "documents")
      .write.mode("overwrite")
      .option("header", "true")
      // the CSV writer TRIMS cell whitespace by default — disable both
      // sides so string round-trips are byte-exact
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    val (clean, _) = quarantine(Tables.csv(spark, out, documentsSchema))
    clean.select(docCols: _*)
  }

  def jsonRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_ingest_json").toString
    Tables(spark, dir, "documents").write.mode("overwrite").json(out)
    val (clean, _) = quarantine(Tables.json(spark, out, documentsSchema))
    clean.select(docCols: _*)
  }

  /** Schema-evolution read: a parquet table whose later files carry
    * columns the early files lack (the normal life of a long-lived
    * landing table — producers add fields, history is never
    * rewritten). `mergeSchema` unions the file footers; rows from
    * pre-evolution files surface the new columns as NULL, and
    * `defaults` backfills them so downstream logic never
    * special-cases vintage. Footer merging reads metadata only —
    * data pages are untouched — and per-file schemas are still
    * pruned/pushed down individually, so old files don't pay for
    * columns they lack.
    */
  def readEvolved(spark: SparkSession, path: String,
                  defaults: Map[String, Any] = Map.empty): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    defaults.foldLeft(merged) { case (df, (c, v)) =>
      if (df.columns.contains(c))
        df.withColumn(c, coalesce(col(c), lit(v)))
      else df.withColumn(c, lit(v))
    }
  }
}
