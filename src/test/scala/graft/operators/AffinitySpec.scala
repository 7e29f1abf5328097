package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r15 basket-aggregate rewrite of [[Affinity.basketPairs]]
  * to the reference formulation it replaced: distinct (order, part)
  * grain → okey self-join with pk_a < pk_b → pair counts. The
  * rewrite mines pairs map-side from a sorted per-order basket array
  * (one exchange, no self-join); rows must be IDENTICAL — the DuckDB
  * oracle still replays the self-join form.
  */
class AffinitySpec extends SparkSpec {
  import spark.implicits._

  test("basket-aggregate pair mining equals the distinct self-join " +
       "reference (support, lift, minSupport cut)") {
    // orders: 10 holds {1,2,3} (one dup row), 20 holds {1,2}, 30 holds
    // {2,3}, 40 holds {7} (no pairs), 50 holds {1,2} again → (1,2)
    // support 2; every other pair support 1 falls to minSupport=2
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 2L), (30L, 3L),
      (40L, 7L),
      (50L, 1L), (50L, 2L))
      .toDF("l_orderkey", "l_partkey")

    val got = Affinity.basketPairs(li, minSupport = 1L)
      .orderBy("part_a", "part_b").collect().map(_.toSeq).toSeq

    // reference formulation, computed independently
    val items = li.select(col("l_orderkey").as("okey"),
      col("l_partkey").as("pk")).distinct()
    val counts = items.groupBy("pk").agg(count(lit(1)).as("n"))
    val nOrders = items.select(countDistinct("okey")).head().getLong(0)
    val want = items.as("a")
      .join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .join(counts.select(col("pk").as("part_a"), col("n").as("na")), "part_a")
      .join(counts.select(col("pk").as("part_b"), col("n").as("nb")), "part_b")
      .select(col("part_a"), col("part_b"), col("support"),
        round(col("support").cast("double") * nOrders /
          (col("na") * col("nb")), 4).as("lift"))
      .orderBy("part_a", "part_b").collect().map(_.toSeq).toSeq

    assert(got === want)
    assert(got.nonEmpty)

    // minSupport=2 keeps (1,2) [orders 10,20,50 → support 3] and
    // (2,3) [orders 10,30 → support 2]; (1,3) support 1 is cut.
    // n_orders=5, n(1)=3, n(2)=4, n(3)=2 → both lifts 1.25
    val cut = Affinity.basketPairs(li, minSupport = 2L)
      .orderBy("part_a", "part_b").collect()
    assert(cut.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq ===
      Seq((1L, 2L, 3L, 1.25), (2L, 3L, 2L, 1.25)))
  }

  test("pair mining is join-free: no self-join on the basket frame") {
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val df = Affinity.basketPairs(li)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    // the only joins left are the catalog-grain lift joins (guarded
    // broadcast) and the 1-row nOrders cross join — never a
    // SortMergeJoin/ShuffledHashJoin of the order-grain frame with
    // itself (AQE may plan the tiny guard path differently; what is
    // pinned is the absence of the okey self-join's sort-merge)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
