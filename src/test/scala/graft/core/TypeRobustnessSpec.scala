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
}
