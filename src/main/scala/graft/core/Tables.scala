package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Single place that knows how driver test tables are stored.
  *
  * At 100 TB the only change needed is here: point at the warehouse
  * (bucketed tables / a catalog) instead of loose parquet files. Every
  * operator downstream is declarative, so partition pruning, predicate
  * pushdown and column pruning flow through Catalyst unchanged.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS), which Spark only reads as a raw
    // nanos LONG (spark.sql.legacy.parquet.nanosAsLong=true — set by
    // Verify/Bench/tests). Normalize to a proper microsecond TIMESTAMP;
    // integer `div` keeps full precision (a double division would not,
    // 2024 epoch-nanos exceed 2^53).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  // ---- non-parquet sources -------------------------------------------
  // Schema is REQUIRED, never inferred: at 100 TB inference is a full
  // extra pass over the data, and silently re-types columns under schema
  // drift. PERMISSIVE + a corrupt-record column quarantines bad rows
  // instead of failing the job (or silently nulling fields).

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: org.apache.spark.sql.types.StructType) =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType)

  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  def json(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
}
