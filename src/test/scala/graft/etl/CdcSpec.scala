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

  test("snapshotDiff digest is collision-free on NULL-vs-empty, " +
       "shifted-field, and separator-byte payloads") {
    val keys = Seq("id"); val payload = Seq("a", "b")
    def diff(o: Seq[(Long, String, String)], n: Seq[(Long, String, String)]) =
      feedOf(Cdc.snapshotDiff(o.toDF("id", "a", "b"), n.toDF("id", "a", "b"),
        keys, payload))

    // a real NULL → '' update must surface as U, not vanish
    assert(diff(Seq((1L, null, "x")), Seq((1L, "", "x"))) == Set((1L, "U")),
      "NULL-to-empty update digested as unchanged")
    // shifted-field payloads ('ab','') vs ('a','b') must differ
    assert(diff(Seq((1L, "ab", "")), Seq((1L, "a", "b"))) == Set((1L, "U")),
      "shifted-field payloads digested identically")
    // values CONTAINING any would-be separator byte can't alias a
    // field boundary under length-prefixing
    assert(diff(Seq((1L, "ab", "c")), Seq((1L, "a", "bc")))
      == Set((1L, "U")), "separator bytes inside values aliased a boundary")
    // and genuinely identical rows — including all-NULL — stay silent
    assert(diff(Seq((1L, null, null), (2L, "", "")),
      Seq((1L, null, null), (2L, "", ""))).isEmpty)
  }

  test("diffAgainstStored persists each drop's feed durably under " +
       "<state>.feed before the swap — recoverable after a post-swap crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fefeed")
      .toString + "/state"
    val keys = Seq("id"); val payload = Seq("v")
    Cdc.diffAgainstStored(dir, Seq((1L, "a")).toDF("id", "v"), keys, payload)
      .collect()
    Cdc.diffAgainstStored(dir, Seq((1L, "A"), (2L, "b")).toDF("id", "v"),
      keys, payload).collect()
    // the caller crashed before consuming the second feed: the state
    // already advanced, but the feed survives on disk for re-reading
    val recovered = feedOf(spark.read.parquet(dir + ".feed")
      .select("id", "op"))
    assert(recovered == Set((1L, "U"), (2L, "I")),
      s"durable feed lost or wrong: $recovered")

    // …and END-TO-END through the caller crash: the consumer replays
    // the recovered feed — twice, because the contract is
    // at-least-once — and the NEXT drop continues from the advanced
    // state with no loss and no double-emit
    def applyFeed(live: Set[Long], feed: Set[(Long, String)]): Set[Long] =
      live -- feed.collect { case (k, "D") => k } ++
        feed.collect { case (k, op) if op != "D" => k }
    var live = Set(1L) // consumer state after drop 1
    live = applyFeed(live, recovered)
    live = applyFeed(live, recovered) // replay converges (idempotent)
    assert(live == Set(1L, 2L), s"recovered-feed replay diverged: $live")
    val feed3 = feedOf(Cdc.diffAgainstStored(
      dir, Seq((2L, "b")).toDF("id", "v"), Seq("id"), Seq("v")))
    assert(feed3 == Set((1L, "D")),
      s"post-crash drop re-emitted or lost rows: $feed3")
    live = applyFeed(live, feed3)
    assert(live == Set(2L), s"consumer diverged from source: $live")
  }
}
