package graft.etl

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** [[Cdc.diffAgainstStored]] — the full-extract ingestion shape:
  * per-drop I/U/D feeds against crash-safely swapped snapshot state.
  * ([[Cdc.applyChanges]] / [[Cdc.snapshotDiff]] themselves are
  * oracle-checked as cdc_apply / snapshot_diff.)
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def feedOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("diffAgainstStored: first drop all-I, updates/deletes/inserts per " +
       "drop, re-delivery empty, interrupted swap adopted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fullex")
      .toString + "/state"
    val keys = Seq("id"); val payload = Seq("v")

    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(feedOf(Cdc.diffAgainstStored(dir, v1, keys, payload)) ==
      Set((1L, "I"), (2L, "I")), "first drop must be all inserts")

    // drop 2: 1 deleted, 2 updated, 3 new
    val v2 = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    assert(feedOf(Cdc.diffAgainstStored(dir, v2, keys, payload)) ==
      Set((1L, "D"), (2L, "U"), (3L, "I")))

    // the SAME snapshot re-delivered: diff-against-state is naturally
    // idempotent — empty feed, state unchanged
    assert(Cdc.diffAgainstStored(dir, v2, keys, payload).isEmpty)

    // simulate a crash between state delete and stage rename: the
    // state dir vanishes but the stage (holding v2) survives — the
    // next drop adopts the stage and diffs against v2, not against
    // nothing (which would re-emit everything as inserts)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(dir), new Path(dir + ".staged")))
    val v3 = Seq((3L, "c")).toDF("id", "v")
    assert(feedOf(Cdc.diffAgainstStored(dir, v3, keys, payload)) ==
      Set((2L, "D")), "interrupted swap was not adopted")
  }
}
