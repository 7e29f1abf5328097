package graft.etl

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def grid = for { a <- 0 until 64; b <- 0 until 64 }
    yield (a.toLong, b.toLong, s"p_${a}_$b")

  test("z-order preserves the row multiset and interleaves both dimensions") {
    val dir = Files.createTempDirectory("graft_z").toString + "/t"
    grid.toDF("a", "b", "payload").write.parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    val n = Maintenance.zOrderBy(spark, dir, Seq("a", "b"),
      targetBytes = 4096)
    assert(n > 1, s"want multiple files, got $n")
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // no helper column leaked into the table
    assert(!spark.read.parquet(dir).columns.contains("__z"))
  }

  test("a filter on the SECOND z column skips files that linear clustering must read") {
    val linDir = Files.createTempDirectory("graft_zlin").toString + "/t"
    val zDir = Files.createTempDirectory("graft_zz").toString + "/t"
    grid.toDF("a", "b", "payload").write.parquet(linDir)
    grid.toDF("a", "b", "payload").write.parquet(zDir)
    // enough files that the curve's top bit planes (both MSBs live in
    // the top two z bits) actually partition: ~16 files = 4 z bits
    Maintenance.clusterBy(spark, linDir, Seq("a"), targetBytes = 1536)
    Maintenance.zOrderBy(spark, zDir, Seq("a", "b"), targetBytes = 1536)

    def overlapping(dir: String, lo: Long, hi: Long): Int =
      Maintenance.fileRanges(spark, dir, "b")
        .count { case (_, flo, fhi) => fhi >= lo && flo <= hi }
    val nLin = Maintenance.fileRanges(spark, linDir, "b").size
    val nZ = Maintenance.fileRanges(spark, zDir, "b").size
    // linear clustering on `a` leaves b spanning its full range in
    // EVERY file: a b-slice read touches all of them. Z-order gives b
    // its own bit planes, so the same slice skips most files.
    val linHit = overlapping(linDir, 10, 12)
    val zHit = overlapping(zDir, 10, 12)
    assert(linHit == nLin, s"expected the b-slice to hit every linear file ($linHit/$nLin)")
    assert(zHit * 2 <= nZ, s"z-order should skip at least half the files, hit $zHit/$nZ")
    // and the FIRST column keeps locality too: an a-slice also skips
    val aHit = Maintenance.fileRanges(spark, zDir, "a")
      .count { case (_, flo, fhi) => fhi >= 10 && flo <= 12 }
    assert(aHit * 2 <= nZ, s"a-slice should also skip, hit $aHit/$nZ")
  }

  test("NULLs and empty samples degrade to bucket 0 instead of NULL z keys") {
    val df = Seq((Some(1L), 5L), (None, 6L), (Some(3L), 7L))
      .toDF("a", "b")
    val z = Maintenance.withZValue(df, Seq("a", "b"), bitsPerCol = 4)
    assert(z.filter(col("__z").isNull).count() == 0)
    assert(z.count() == 3)
  }
}
