package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result on skewed data") {
    // 10k rows of one hot key + a long tail
    val big = ((1 to 10000).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"tail$i"))).toDF("k", "payload")
    val small = (1L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val expected = big.join(small, Seq("k"))
      .orderBy("k", "payload").collect().toSeq
    val got = SkewJoin.saltedInner(big, small, Seq("k"), saltBuckets = 8)
      .orderBy("k", "payload").collect().toSeq
    assert(got == expected)
    // the hot key's rows really do land in several salt buckets
    val salts = big.filter(col("k") === 1L)
      .withColumn("s", pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("s").distinct().count()
    assert(salts > 1)
  }

  test("dropHotKeys removes only over-frequency keys") {
    val df = ((1 to 100).map(_ => "hot") ++ Seq("a", "b", "c")).toDF("k")
    val kept = SkewJoin.dropHotKeys(df, col("k"), maxDf = 10)
      .select("k").collect().map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("a", "b", "c"))
  }

  test("dropHotKeys never co-locates a hot key: no window, counts via hash-agg + broadcast anti-join") {
    val df = ((1 to 100).map(_ => "hot") ++ Seq("a", "b", "c")).toDF("k")
    val out = SkewJoin.dropHotKeys(df, col("k"), maxDf = 10)
    out.collect() // drive AQE to the final plan
    val plan = {
      val s = out.queryExecution.executedPlan.toString
      s.indexOf("== Initial Plan ==") match {
        case -1 => s
        case i  => s.substring(0, i)
      }
    }
    assert(!plan.contains("Window"),
      s"hot-key count funnels through a window:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hot keys not broadcast anti-joined:\n$plan")
  }
}
