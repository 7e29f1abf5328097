package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class StarSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("banded maps bounds inclusively and falls through to last label") {
    val df = Seq(5.0, 9.0, 10.0, 20.0, 21.0, 35.0, 36.0, 45.0, 46.0, 50.0)
      .toDF("q")
      .select(StarSchema.banded(col("q"),
        WeatherMart.BandBounds, WeatherMart.BandLabels).as("b"))
    assert(df.as[String].collect().toSeq == Seq(
      "Freezing", "Freezing", "Cold", "Cold", "Mild", "Mild",
      "Warm", "Warm", "Hot", "Hot"))
  }

  test("dimDate derives ISO calendar attributes") {
    // 2024-01-01 is a Monday, ISO week 1, day-of-year 1.
    val df = Seq("2024-01-01", "2024-01-01", "2024-12-31").toDF("d")
    val dim = StarSchema.dimDate(df, col("d")).orderBy("date_key").collect()
    assert(dim.length == 2) // distinct
    val jan1 = dim.head
    assert(jan1.getAs[Long]("year") == 2024L)
    assert(jan1.getAs[Long]("day_of_week") == 1L) // ISO Monday = 1
    assert(jan1.getAs[Long]("week_of_year") == 1L)
    assert(jan1.getAs[Long]("day_of_year") == 1L)
    // 2024-12-31 is a Tuesday in ISO week 1 of 2025.
    val dec31 = dim.last
    assert(dec31.getAs[Long]("day_of_week") == 2L)
    assert(dec31.getAs[Long]("week_of_year") == 1L)
  }

  test("scd1 assigns dense surrogate keys in natural-key order") {
    val dim = StarSchema.scd1(
      Seq(("b", 2), ("a", 1), ("b", 2)).toDF("k", "v"),
      naturalKey = Seq("k", "v"), orderBy = Seq("k"),
      keyName = "sk", validFrom = "2026-01-01")
      .orderBy("sk").collect()
    assert(dim.map(r => (r.getAs[Long]("sk"), r.getAs[String]("k"))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(dim.forall(_.getAs[Boolean]("is_current")))
  }

  test("fact windows: day delta and 7-row rolling sum per location") {
    val fact = WeatherMart.fact(spark, sf()).orderBy("location_key",
      "date_key", "l_orderkey", "l_linenumber")
    val rows = fact.filter(col("location_key") === 1).limit(8).collect()
    // first row of a partition has no predecessor
    assert(rows.head.isNullAt(rows.head.fieldIndex("temp_day_delta")))
    // delta(row1) = temp(row1) - temp(row0), rounded to 4
    val d = rows(1).getAs[Double]("temp_day_delta")
    val expected = BigDecimal(rows(1).getAs[Double]("avg_temp_f") -
      rows(0).getAs[Double]("avg_temp_f"))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(d - expected) < 1e-9)
    // rolling sum at row 7 covers rows 1..7 (6 preceding + current)
    val r7 = rows(7).getAs[Double]("precipitation_7d_sum")
    val manual = (1 to 7).map(rows(_).getAs[Double]("precipitation_in")).sum
    assert(math.abs(r7 - BigDecimal(manual).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
  }

  test("validate_fact reports zero null FKs") {
    val v = WeatherMart.validateFact(spark, sf()).collect().head
    assert(v.getAs[Long]("null_fk_count") == 0L)
    assert(v.getAs[Double]("min_temp") <= v.getAs[Double]("max_temp"))
  }
}
