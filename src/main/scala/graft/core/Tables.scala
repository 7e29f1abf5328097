package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeVectors(normalizeTimestamps(
      spark.read.parquet(s"$dir/$name.parquet")))

  /** Normalize every timestamp encoding the driver parquet has shipped
    * so far to a plain microsecond TIMESTAMP:
    *  - TIMESTAMP(NANOS): Spark only reads it as a raw nanos LONG
    *    (spark.sql.legacy.parquet.nanosAsLong=true — set by
    *    Verify/Bench/tests); integer `div` keeps full precision (a
    *    double division would not, 2024 epoch-nanos exceed 2^53).
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false micros): functions like
    *    `unix_micros` reject NTZ with DATATYPE_MISMATCH, so cast to
    *    TIMESTAMP — the session TZ is pinned to UTC everywhere, so the
    *    cast is a re-tag, bit-identical to the oracle's epoch_us.
    * Doing this at the single IO chokepoint keeps every downstream
    * operator agnostic to how the harness encodes time.
    */
  def normalizeTimestamps(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          d.withColumn("ts", timestamp_micros(expr(s"`${f.name}` div 1000")))
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d
      }
    }

  /** Canonicalize embedding columns to `array<float>`: the harness
    * writes float32 today, but `float64` is the pandas/pyarrow DEFAULT
    * — one regenerated parquet away — and the native vector kernels
    * (VectorDot/VectorCosine/PqCodes) are float32-typed, so a shifted
    * encoding would fail analysis on every similarity query at once
    * (the round-5 NTZ lesson, vector edition). The float64→float32
    * cast is lossy past ~7 significant digits; every cosine the
    * oracle compares is rounded to 4, so the absorbed shift stays
    * hash-compatible. TypeRobustnessSpec pins the behavior.
    */
  def normalizeVectors(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case ArrayType(DoubleType, n) if f.name == "embedding" =>
          d.withColumn(f.name, col(f.name).cast(ArrayType(FloatType, n)))
        case _ => d
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
