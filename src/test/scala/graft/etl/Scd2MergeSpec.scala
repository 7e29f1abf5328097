package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2MergeSpec extends SparkSpec {
  import spark.implicits._

  private val key = Seq("postal_code")
  private val attrs = Seq("city_name", "country")

  private def snapshot(rows: (Long, String, String)*) =
    rows.toDF("postal_code", "city_name", "country")

  test("scd2Merge versions changed rows, inserts new keys, keeps the rest") {
    val dim = StarSchema.scd1(
      snapshot((1L, "aa", "US"), (2L, "bb", "US"), (3L, "cc", "FR")),
      naturalKey = key ++ attrs, orderBy = key,
      keyName = "location_key", validFrom = "2026-01-01")

    val merged = StarSchema.scd2Merge(dim,
      snapshot((1L, "aa", "US"),      // unchanged
               (2L, "bb", "DE"),      // attr change → new version
               (4L, "dd", "JP")),     // new key
      businessKey = key, attrs = attrs,
      keyName = "location_key", asOf = "2026-02-01")
      .orderBy("postal_code", "valid_from")

    val rows = merged.select("location_key", "postal_code", "city_name",
        "country", "is_current")
      .as[(Long, Long, String, String, Boolean)].collect().toSeq
    // new surrogate keys continue after max(3), assigned in business-key
    // order: postal 2's new version → 4, postal 4 → 5
    assert(rows == Seq(
      (1L, 1L, "aa", "US", true),   // untouched (and postal 3 below: absent
      (2L, 2L, "bb", "US", false),  //   from snapshot, stays current)
      (4L, 2L, "bb", "DE", true),
      (3L, 3L, "cc", "FR", true),
      (5L, 4L, "dd", "JP", true)), s"got $rows")

    // closed-out row carries the asOf date; current rows stay open
    val closed = merged.filter(!col("is_current")).collect()
    assert(closed.length == 1)
    assert(closed.head.getAs[java.sql.Date]("valid_to").toString == "2026-02-01")
    assert(merged.filter(col("is_current")).filter(col("valid_to").isNotNull)
      .count() == 0)
  }

  test("scd2Merge is idempotent on an identical snapshot") {
    val dim = StarSchema.scd1(
      snapshot((1L, "aa", "US"), (2L, "bb", "US")),
      naturalKey = key ++ attrs, orderBy = key,
      keyName = "location_key", validFrom = "2026-01-01")
    val merged = StarSchema.scd2Merge(dim,
      snapshot((1L, "aa", "US"), (2L, "bb", "US")),
      businessKey = key, attrs = attrs,
      keyName = "location_key", asOf = "2026-02-01")
    assert(merged.orderBy("location_key").collect().toSeq ==
      dim.orderBy("location_key").collect().toSeq)
  }

  test("merging twice keeps exactly one current row per business key") {
    val dim0 = StarSchema.scd1(snapshot((1L, "aa", "US")),
      naturalKey = key ++ attrs, orderBy = key,
      keyName = "location_key", validFrom = "2026-01-01")
    val dim1 = StarSchema.scd2Merge(dim0, snapshot((1L, "aa", "DE")),
      businessKey = key, attrs = attrs,
      keyName = "location_key", asOf = "2026-02-01")
    val dim2 = StarSchema.scd2Merge(dim1, snapshot((1L, "aa", "JP")),
      businessKey = key, attrs = attrs,
      keyName = "location_key", asOf = "2026-03-01")
    val byKey = dim2.groupBy("postal_code")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n_versions")).collect().head
    assert(byKey.getAs[Long]("n_current") == 1L)
    assert(byKey.getAs[Long]("n_versions") == 3L)
    // surrogate keys are unique across versions
    assert(dim2.select("location_key").distinct().count() == 3)
  }
}
