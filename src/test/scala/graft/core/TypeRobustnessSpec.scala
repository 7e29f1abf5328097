package graft.core

import graft.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Harness type-robustness battery.
  *
  * Round 5 proved the driver's parquet encoding can shift under the
  * repo (TIMESTAMP(NANOS)-as-LONG → TIMESTAMP_NTZ micros between
  * rounds), silently breaking every `unix_micros` call site while the
  * specs' hand-built TimestampType frames stayed green. This suite
  * fails FAST with a named message if it happens again, and pins the
  * contract that makes call sites immune: [[Tables.normalizeTimestamps]]
  * maps every encoding the harness has shipped to one canonical
  * microsecond TIMESTAMP.
  */
class TypeRobustnessSpec extends SparkSpec {

  test("every driver table normalizes to plain TIMESTAMP through Tables") {
    for (name <- Tables.All) {
      val df = Tables(spark, sf(), name)
      for (f <- df.schema.fields) {
        assert(f.dataType != TimestampNTZType,
          s"HARNESS TYPE SHIFT: $name.${f.name} is still TIMESTAMP_NTZ after " +
            "Tables normalization — extend Tables.normalizeTimestamps")
        assert(!(f.name == "ts" && f.dataType == LongType),
          s"HARNESS TYPE SHIFT: $name.ts is a raw LONG after Tables " +
            "normalization — parquet nanos handling regressed")
      }
    }
  }

  test("events.ts supports unix_micros and matches raw micros exactly") {
    // the exact capability whose loss broke asof_join/events_sessionize/
    // events_funnel in round 5: unix_micros must resolve on the
    // normalized events table (it rejects NTZ with DATATYPE_MISMATCH)
    val n = Tables(spark, sf(), "events")
      .select(unix_micros(col("ts")).as("us"))
      .filter(col("us").isNotNull)
      .count()
    assert(n > 0, "unix_micros produced no rows on normalized events.ts")
  }

  test("TIMESTAMP and TIMESTAMP_NTZ inputs produce identical operator output") {
    import spark.implicits._
    val base = Seq(
      (1L, 1L, "signup", "2024-01-01 00:00:05.123456", 1.0),
      (2L, 1L, "click", "2024-01-01 00:10:05.000001", 2.0),
      (3L, 1L, "purchase", "2024-01-01 01:10:05.999999", 3.0),
      (4L, 2L, "click", "2024-01-02 09:00:00.5", 4.0),
      (5L, 2L, "view", "2024-01-02 09:10:00.5", 5.0)
    ).toDF("event_id", "user_id", "event_type", "s", "value")
    val tz = base.withColumn("ts", col("s").cast(TimestampType)).drop("s")
    val ntz = base.withColumn("ts", col("s").cast(TimestampNTZType)).drop("s")
    assert(ntz.schema("ts").dataType == TimestampNTZType) // setup sanity

    def viaTables(df: DataFrame): DataFrame = Tables.normalizeTimestamps(df)
    // session TZ is UTC, so the NTZ→TZ re-tag must be value-preserving
    // down to the microsecond (the verdict's epoch_us bit-parity claim)
    val tzUs = tz.select(col("event_id"), unix_micros(col("ts"))).collect().toSeq
    val ntzUs =
      viaTables(ntz).select(col("event_id"), unix_micros(col("ts"))).collect().toSeq
    assert(tzUs == ntzUs)

    def sess(df: DataFrame) =
      Sessionize.sessions(viaTables(df)).collect().toSeq
    assert(sess(ntz) == sess(tz))
    def fun(df: DataFrame) =
      Sessionize.funnel(viaTables(df)).collect().toSeq
    assert(fun(ntz) == fun(tz))
  }

  test("a float64 embedding encoding (the pandas default) normalizes to " +
       "array<float> and keeps the vector kernels working") {
    import spark.implicits._
    val doubles = Seq(
      (1L, Seq(1.0, 0.25, -0.5)), (2L, Seq(0.0, 1.0, 0.125)))
      .toDF("vec_id", "embedding")
    assert(doubles.schema("embedding").dataType.simpleString ==
      "array<double>") // setup sanity
    val normalized = Tables.normalizeVectors(doubles)
    assert(normalized.schema("embedding").dataType.simpleString ==
      "array<float>",
      "HARNESS TYPE SHIFT: float64 embeddings not canonicalized — " +
        "extend Tables.normalizeVectors")
    // the float32-typed native kernel resolves and computes on the
    // normalized frame (it rejects array<double> at analysis)
    val dot = normalized.select(graft.operators.Similarity.cosine(
      col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(dot.forall(c => math.abs(c - 1.0) < 1e-6), dot.toSeq.toString)
    // float32-exact values round-trip bit-identically
    val floats = Seq((1L, Seq(1.0f, 0.25f, -0.5f)), (2L, Seq(0.0f, 1.0f, 0.125f)))
      .toDF("vec_id", "embedding")
    assert(normalized.collect().toSeq.map(_.toString) ==
      floats.collect().toSeq.map(_.toString))
  }
}
