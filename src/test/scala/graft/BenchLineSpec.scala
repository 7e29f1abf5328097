package graft

import org.scalatest.funsuite.AnyFunSuite

/** Simulates the bench output-size contract against the 1996-char tail
  * budget, so line-format regressions fail here — not as a lost round
  * of bench signal (the r2 failure mode).
  */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.benchQueries.keys.toSeq.sorted

  test("short keys are distinct, compact, and cover the full surface") {
    val keys = Bench.shortKeys(names)
    assert(keys.keySet == names.toSet)
    assert(keys.values.toSet.size == names.size, "short-key collision")
    keys.values.foreach(k => assert(k.length <= 6, s"key too long: $k"))
  }

  test("short keys are stable: adding queries never shifts existing keys") {
    val now = Bench.shortKeys(names)
    val future = Bench.shortKeys(names ++
      (1 to 60).map(i => s"future_query_number_$i"))
    names.foreach { n =>
      assert(now(n) == future(n),
        s"key for $n shifted ${now(n)} -> ${future(n)} when queries were added")
    }
  }

  test("compressed line keeps every timing at FULL precision for today's surface") {
    // the surface outgrew verbatim names in round 6 (~100 queries ×
    // ~14-char names ≈ 2.2 KB > the 1996 tail) — compression is now
    // the load-bearing tier, and at ~5-char keys it must hold every
    // distinct timing at the top precision level (3 decimals)
    val keys = Bench.shortKeys(names)
    val qs = names.map(n => "\"" + keys(n) + "\":" + "1.234")
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":99.99,"unit":"sec","queries":$qs}"""
    assert(line.length <= 1996,
      s"compressed full-precision line is ${line.length} chars (> 1996)")
  }

  test("derived keys never collide with the dashboard stand-in names") {
    // q1i..q5i / q1m..q5m pass through compression outside the map, so
    // a derived key equal to one would emit duplicate JSON keys. Sweep
    // enough q-initial one-word names that, unguarded, dozens would
    // hash into the reserved set.
    val qNames = (0 until 5000).map(i => s"qword$i")
    val keys = Bench.shortKeys(names ++ qNames)
    keys.foreach { case (n, k) =>
      assert(n == k || !Bench.ReservedKeys(k),
        s"derived key for $n collides with stand-in $k")
    }
    val dups = keys.groupBy(_._2).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"collision after steering: ${dups.map { case (k, m) => s"$k<-${m.keys.mkString("/")}" }.mkString(", ")}")
  }

  test("every coverage tier that carries dashboards carries BOTH families") {
    // r6-r9 showed the old per-round family alternation stuck on mart
    // under re-run edges, starving q1i..q5i of (fallback-tier) artifact
    // history. The ladder now stands BOTH families in: tier 1/2 under
    // real/compressed names + verbatim q1m..q5m, tiers 3/4 under the
    // ten 3-char stand-ins. Only the emergency tiers (5/6) shed them.
    val timed = Seq(
      "dedup_exact" -> 1.0, "q1_avg_by_date" -> 0.5, "q2_topn_by_location" -> 0.4,
      "q3_avg_by_class" -> 0.3, "q4_band_counts" -> 0.2, "q5_pct_positive" -> 0.1,
      "q1m" -> 0.5, "q2m" -> 0.4, "q3m" -> 0.3, "q4m" -> 0.2, "q5m" -> 0.1)
    val keys = Bench.shortKeys(timed.map(_._1))
    val tiers = Bench.tiers(timed, keys)
    assert(tiers.size == 6)
    val inlineKeys = (1 to 5).map(i => s"q${i}i").toSet
    val martKeys = (1 to 5).map(i => s"q${i}m").toSet
    // tiers 3 and 4 (index 2, 3): both stand-in families present
    for (i <- Seq(2, 3)) {
      val ks = tiers(i)._1.map(_._1).toSet
      assert(inlineKeys.subsetOf(ks), s"tier ${i + 1} missing inline family: $ks")
      assert(martKeys.subsetOf(ks), s"tier ${i + 1} missing mart family: $ks")
    }
    // tier 1 carries inline under real names + mart verbatim
    val t1 = tiers(0)._1.map(_._1).toSet
    assert(t1.contains("q1_avg_by_date") && martKeys.subsetOf(t1))
    // no tier emits duplicate keys (stand-ins never shadow a real name)
    tiers.foreach { case (es, _) =>
      assert(es.map(_._1).distinct.size == es.size, s"duplicate keys in $es")
    }
    // the ten stand-ins cost ~60 chars over a single family — verify a
    // full-surface tier-3 line still fits the tail budget at 1 decimal
    val base = names.filterNot(n => "^q[1-5]_".r.findFirstIn(n).isDefined)
    val qs = (base.map(keysFull) ++ inlineKeys ++ martKeys).toSeq.sorted
      .map(k => "\"" + k + "\":9.9").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":999,"queries":$qs}"""
    assert(line.length <= 1996,
      s"both-family fallback line is ${line.length} chars (> 1996)")
  }

  private lazy val keysFull = Bench.shortKeys(names)

  test("re-baseline two-run rule: 14% quiet-run disagreement is refused, 10% passes") {
    // the round-9 pair (130.1 vs 112.3 = 15.9% spread) must NOT commit
    // a budget; two runs within 10% must (BENCH_PROTOCOL.md)
    assert(Bench.quietSpread(130.1, 112.3) > 0.10)
    assert(Bench.quietSpread(120.0, 125.0) <= 0.10)
    assert(Bench.quietSpread(100.0, 110.0) <= 0.10)
    assert(Bench.quietSpread(100.0, 111.0) > 0.10)
    // symmetric
    assert(Bench.quietSpread(112.3, 130.1) == Bench.quietSpread(130.1, 112.3))
  }

  test("contention verdict: run sentinel vs the budget's certified sentinel") {
    val budget = """{ "sentinel": 0.030, "git_rev": "abc", "budgets": {} }"""
    assert(Bench.budgetSentinel(budget).contains(0.030))
    // a quiet run's median sits inside the band (host-rebuild shift
    // itself measured 1.3x; round-to-round swing ~±40%)
    assert(!Bench.isContended(budget, 0.030))
    assert(!Bench.isContended(budget, 0.045))
    assert(!Bench.isContended(budget, 0.059))
    // real contention (r12: bigram_lift 963s contended vs 31s isolated)
    assert(Bench.isContended(budget, 0.061))
    assert(Bench.isContended(budget, 0.900))
    // no stamped sentinel / degenerate zero: never contended (nothing
    // to compare against — same silence as the over-budget check)
    assert(!Bench.isContended("""{ "budgets": {} }""", 9.9))
    assert(!Bench.isContended("""{ "sentinel": 0.0 }""", 9.9))
  }

  test("BENCH_KEYS.md is in sync with the bench surface") {
    // the committed legend is what makes a compressed bench artifact
    // decodable without stderr; regenerate with
    //   sbt "runMain graft.tools.GenBenchKeys"
    val expected = Bench.legendMarkdown(Bench.legendNames)
    val onDisk = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("BENCH_KEYS.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(onDisk == expected,
      "BENCH_KEYS.md is stale — run: sbt \"runMain graft.tools.GenBenchKeys\"")
  }

  test("over-budget check: band normalization cancels a uniform host shift, " +
       "flags only idiosyncratic regressions") {
    val budget = """{
      |  "sentinel": 0.10,
      |  "budgets": {
      |    "q_a": 1.0, "q_b": 2.0, "q_c": 4.0, "q_regressed": 1.0
      |  }
      |}""".stripMargin
    // host uniformly 1.5x slower: a/b/c all at 1.5x set the median
    // band; q_regressed at 4.5s is 4.5x raw = 3x band-normalized —
    // flagged; q_new has no budget entry — skipped, never a false alarm
    val over = Bench.overBudgetFrom(budget,
      Seq("q_a" -> 1.5, "q_b" -> 3.0, "q_c" -> 6.0,
        "q_regressed" -> 4.5, "q_new" -> 9.0))
    assert(over.map(_._1) == Seq("q_regressed"), s"got $over")
    assert(math.abs(over.head._2 - 3.0) < 1e-9)
    // an identical-throughput host with no regression flags nothing
    assert(Bench.overBudgetFrom(budget,
      Seq("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 4.0)).isEmpty)
    // small even overlap with one GENUINE speedup: the fast outlier
    // takes the lower-median band seat, but the on-budget query's raw
    // ratio 1.0 exempts it — an optimization is never a breach
    assert(Bench.overBudgetFrom(budget,
      Seq("q_a" -> 0.4, "q_b" -> 2.0)).isEmpty)
    // a uniform 2.5x host shift exceeds raw 2x everywhere but
    // normalizes to 1x — environment, not regression
    assert(Bench.overBudgetFrom(budget,
      Seq("q_a" -> 2.5, "q_b" -> 5.0, "q_c" -> 10.0)).isEmpty)
    // degenerate inputs never divide by zero or flag
    assert(Bench.overBudgetFrom("""{"budgets":{}}""",
      Seq("q_a" -> 1.5)).isEmpty)
    assert(Bench.overBudgetFrom(budget, Seq.empty).isEmpty)
  }

  test("budget sections parse independently: the shuffle section can " +
       "never shadow a time budget (same query names in both)") {
    val json = """{
      |  "sentinel": 0.10,
      |  "budgets": { "q_a": 1.0, "q_b": 2.0 },
      |  "shuffle": { "q_a": 1048576, "q_b": 99 }
      |}""".stripMargin
    val (budgets, shuffle) = Bench.budgetSections(json)
    assert(budgets == Map("q_a" -> 1.0, "q_b" -> 2.0),
      s"time budgets polluted by shuffle numbers: $budgets")
    assert(shuffle == Map("q_a" -> 1048576.0, "q_b" -> 99.0))
    // a pre-shuffle-era file (no section) still parses
    val (b2, s2) = Bench.budgetSections("""{"budgets":{"q_a": 1.0}}""")
    assert(b2 == Map("q_a" -> 1.0) && s2.isEmpty)
  }

  test("over-shuffle check: raw >2x bytes with a 1 MiB absolute floor; " +
       "new and tiny queries never false-alarm") {
    val mib = 1L << 20
    val json = s"""{
      |  "sentinel": 0.10,
      |  "budgets": { "q_a": 1.0 },
      |  "shuffle": { "q_big": ${10 * mib}, "q_small": 1000, "q_zero": 0 }
      |}""".stripMargin
    // q_big tripled its shuffle — flagged at 3.0x
    val over = Bench.overShuffleFrom(json, Seq(
      "q_big" -> 30 * mib,   // 3x and +20 MiB → flag
      "q_small" -> 500000,   // 500x but under the 1 MiB floor → skip
      "q_zero" -> 5 * mib,   // degenerate committed 0 → skip
      "q_new" -> 100 * mib)) // no committed entry → skip
    assert(over.map(_._1) == Seq("q_big"), s"got $over")
    assert(math.abs(over.head._2 - 3.0) < 1e-9)
    // within 2x → silent; exactly-at-floor delta → silent
    assert(Bench.overShuffleFrom(json, Seq("q_big" -> 19 * mib)).isEmpty)
    assert(Bench.overShuffleFrom(json,
      Seq("q_small" -> (1000 + mib))).isEmpty)
    assert(Bench.overShuffleFrom(json, Seq.empty).isEmpty)
  }

  test("compressed line holds 160 queries at 1 decimal (growth headroom)") {
    // +~60 queries over today's surface still fits with every distinct
    // timing present once the precision ladder reaches 1 decimal
    val all = names ++ (1 to (160 - names.size)).map(i => s"future_query_number_$i")
    val keys = Bench.shortKeys(all)
    val qs = all.sorted.map(n => "\"" + keys(n) + "\":" + "9.9")
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":999,"queries":$qs}"""
    assert(line.length <= 1996,
      s"compressed 160-query line is ${line.length} chars (> 1996)")
  }
}
