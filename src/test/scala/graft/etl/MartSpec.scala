package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MartSpec extends SparkSpec {

  test("materialized mart round-trips and the fact prunes by partition") {
    val out = Files.createTempDirectory("graft_mart").toString
    Mart.materialize(spark, sf(), out)

    // every table lands and is readable
    (Mart.DimTables :+ Mart.FactTable).foreach { t =>
      assert(Mart.table(spark, out, t).count() > 0, s"table $t is empty")
    }
    // fact content round-trips (modulo the derived partition column)
    val direct = WeatherMart.fact(spark, sf())
    val mart = Mart.table(spark, out, Mart.FactTable)
    assert(mart.count() == direct.count())
    assert(mart.columns.toSet == direct.columns.toSet + "year")

    // a date-ranged read prunes year partitions before opening files
    val pruned = Mart.factBetween(spark, out, "1995-01-01", "1995-12-31")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("year"),
      s"expected partition filters on year in:\n$plan")
    val years = pruned.select("year").distinct().collect().map(_.getInt(0)).toSet
    assert(years == Set(1995))
    // and the pruned read agrees with filtering the full fact
    val expected = direct
      .filter(org.apache.spark.sql.functions.col("date_key")
        .between("1995-01-01", "1995-12-31")).count()
    assert(pruned.count() == expected)

    // dashboard queries produce identical results over the
    // materialized tables and the inline-derived mart
    val q1Mart = Dashboard.avgByDate(
      Mart.table(spark, out, Mart.FactTable),
      Mart.table(spark, out, "dim_date")).collect().toSeq
    val q1Direct = Dashboard.avgByDate(spark, sf()).collect().toSeq
    assert(q1Mart == q1Direct)
    val q4Mart = Dashboard.bandCounts(
      Mart.table(spark, out, Mart.FactTable)).collect().toSeq
    assert(q4Mart == Dashboard.bandCounts(spark, sf()).collect().toSeq)
  }

  test("refreshFact overwrites only the touched year partitions") {
    val out = Files.createTempDirectory("graft_mart_refresh").toString
    Mart.materialize(spark, sf(), out)
    val fact = Mart.table(spark, out, Mart.FactTable)
    val years = fact.select("year").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(years.length >= 2, s"need ≥2 year partitions, got ${years.toSeq}")
    val (touched, untouched) = (years.head, years.last)

    val before = fact.filter(col("year") === untouched).count()
    // simulate a corrected reload of the oldest year: drop half its rows
    val corrected = WeatherMart.fact(spark, sf())
      .filter(year(col("date_key")) === touched &&
        pmod(col("l_orderkey"), lit(2)) === 0)
    val expected = corrected.count()
    Mart.refreshFact(spark, out, corrected)

    val after = Mart.table(spark, out, Mart.FactTable)
    assert(after.filter(col("year") === touched).count() == expected,
      "touched partition was not replaced")
    assert(after.filter(col("year") === untouched).count() == before,
      "untouched partition changed under dynamic overwrite")
  }

  test("mergeFact: key-level copy-on-write — updates replace, new keys " +
       "insert, merged mart ≡ recompute, untouched year files " +
       "byte-identical") {
    val out = Files.createTempDirectory("graft_mart_merge").toString
    Mart.materialize(spark, sf(), out)
    val factDir = s"$out/${Mart.FactTable}"
    val years = Mart.table(spark, out, Mart.FactTable)
      .select("year").distinct().collect().map(_.getInt(0)).sorted
    assert(years.length >= 2)
    val touched = years.head

    def listing(): Map[String, (Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(factDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
        fs.listStatus(p).flatMap(st =>
          if (st.isDirectory) walk(st.getPath) else Seq(st)).toSeq
      walk(new org.apache.hadoop.fs.Path(factDir))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.toString ->
          (st.getLen, st.getModificationTime)).toMap
    }
    val storedBefore = Mart.table(spark, out, Mart.FactTable)
      .drop("year").localCheckpoint()
    val filesBefore = listing()

    // the feed: every 5th row of the oldest year gets its measure
    // corrected (UPDATE), plus one brand-new key (INSERT)
    val updatesPart = storedBefore
      .filter(year(col("date_key")) === touched &&
        pmod(col("l_orderkey"), lit(5)) === 0)
      .withColumn("avg_temp_f", col("avg_temp_f") + 100.0)
    val insertRow = storedBefore
      .filter(year(col("date_key")) === touched).limit(1)
      .withColumn("l_orderkey", lit(999999990L))
    val feed = updatesPart.unionByName(insertRow).localCheckpoint()
    Mart.mergeFact(spark, out, feed)

    // merged ≡ recompute: stored∖feed-keys ∪ feed, row for row
    val keys = Seq("date_key", "l_orderkey", "l_linenumber")
    val expect = storedBefore
      .join(feed.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(feed)
    val got = Mart.table(spark, out, Mart.FactTable).drop("year")
    assert(got.count() == expect.count() &&
      got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "merged mart diverged from recompute")

    // untouched years' files are the ORIGINAL bytes
    val filesAfter = listing()
    val untouchedFiles = filesBefore.keys
      .filterNot(_.contains(s"year=$touched"))
    assert(untouchedFiles.nonEmpty)
    untouchedFiles.foreach { f =>
      assert(filesAfter.get(f).contains(filesBefore(f)),
        s"untouched year file rewritten: $f")
    }

    // replaying the SAME feed converges (anti-join removes its own
    // previous application)
    Mart.mergeFact(spark, out, feed)
    val replay = Mart.table(spark, out, Mart.FactTable).drop("year")
    assert(replay.count() == expect.count() &&
      replay.exceptAll(expect).isEmpty, "merge replay diverged")

    // a NULL date_key in the feed is a CONTRACT error named up front
    // (year(NULL) is NULL — before the guard this surfaced as an
    // opaque NPE mid-merge), and the mart is left untouched
    val before = Mart.table(spark, out, Mart.FactTable).count()
    val bad = feed.limit(1)
      .withColumn("date_key", lit(null).cast("date"))
    val ex = intercept[IllegalArgumentException] {
      Mart.mergeFact(spark, out, bad)
    }
    assert(ex.getMessage.contains("date_key"),
      s"error must name the violated contract: ${ex.getMessage}")
    assert(Mart.table(spark, out, Mart.FactTable).count() == before,
      "failed merge mutated the mart")
  }
}
