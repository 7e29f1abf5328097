package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE compact JSON line with per-query
  * seconds as the LAST stdout line.
  *
  * Queries are forced through the `noop` sink so the full plan executes
  * (a bare count() lets Spark skip compute on projection-only plans).
  * One cheap warmup query absorbs first-use JVM/codegen costs, and each
  * query runs SPARK_GRAFT_BENCH_ITERS times (default 3) reporting the
  * minimum — steady-state plan cost, not JIT/GC noise.
  *
  * Output-size contract: the driver keeps only the last 2000 chars of
  * stdout, so the final JSON line must fit entirely inside that tail
  * (r2's 2.9 KB line lost its head, nulling the round's bench signal).
  * The line is emitted at the largest precision/coverage tier that
  * fits the `budget` defined below; the full-precision per-sample
  * detail goes to stderr for humans. At the current 98-query surface
  * the steady state keeps EVERY distinct query timing in the line by
  * (a) standing the five dashboards in under 3-char keys — q1i..q5i
  * for the inline build path, q1m..q5m for the materialized-mart read
  * path, alternated across rounds via SPARK_GRAFT_BENCH_DASH so both
  * paths accumulate artifact history — (b) shedding the two
  * redundant constant fields last ("sf" is already recorded in the
  * driver artifact's outer JSON; the unit is contractually seconds),
  * and (c) once verbatim names cannot fit at any precision, the
  * [[shortKeys]] name-compression tier keeps every distinct timing
  * under stable ~5-char keys with the legend on stderr.
  *
  * Noise-rejection contract: iterations are round-robin (all queries
  * once, then all again) so a minute-scale host-noise burst cannot
  * cover both samples of one query, AND each round times a cheap
  * sentinel query — a round whose sentinel runs >3x the sentinel median
  * is discarded wholesale (the burst corrupted that round's
  * neighborhood). A query that throws contributes NO sample; queries
  * failing every round are reported in a "failed" list, never as a
  * misleading fast-fail time.
  */
object Bench {

  /** Stable short keys — the name-compression tier that keeps FULL
    * per-query coverage inside the ~2000-char tail budget as the
    * surface grows past what verbatim names can fit.
    *
    * key(name) = first letters of the name's words (≤3) + 2 base-36
    * chars of a murmur hash of the full name: a pure function of the
    * name alone, so a query keeps its key across rounds no matter what
    * other queries are added or removed — artifact history stays
    * joinable. Set-dependent disambiguation (an appended 'a','b',…)
    * only kicks in on a hash collision within an initials group
    * (~1/1300 odds; none in the current surface). The short→full
    * legend always goes to stderr when a compressed line is emitted.
    */
  private[graft] def shortKeys(names: Seq[String]): Map[String, String] = {
    def key(n: String) = {
      val ini = n.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
        .map(_.head).mkString.take(3)
      val b36 = Integer.toString(
        math.floorMod(scala.util.hashing.MurmurHash3.stringHash(n), 1296), 36)
      ini + ("0" * (2 - b36.length)) + b36
    }
    names.distinct.sorted.groupBy(key).toSeq.flatMap {
      case (k, Seq(one)) => Seq(one -> k)
      case (k, many) => many.zipWithIndex.map {
        case (m, i) => m -> (k + ('a' + i).toChar.toString)
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup: touch every table + run one small aggregate; a missing
    // table must not kill the run before the JSON line is printed
    graft.core.Tables.All.foreach { t =>
      try force(graft.core.Tables(spark, sfDir, t).limit(1))
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // Between queries (outside the timed region) drop every persisted /
    // localCheckpoint'd RDD block. These are otherwise freed only when
    // the driver GCs the RDD reference — across 80+ queries × iters the
    // leaked blocks fill the block manager and late queries measure GC
    // thrash instead of their plan (token_count: 23s leaked vs ~0.4s).
    // blocking=true: async removal would storm the block manager while
    // the NEXT query is being timed (orders_monthly_status measured 14s
    // of someone else's cleanup with blocking=false).
    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // optional comma-separated name filter for local iteration; the
    // driver sets no filter and measures everything
    val onlyEnv = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)

    // Stretch surface: the five dashboards re-read from the
    // MATERIALIZED mart — the read path the architecture advertises
    // (year-partitioned fact, pruned scans) — vs their inline twins
    // that rebuild the star schema per query. Materialization itself
    // is untimed setup.
    val martDir = sys.env.getOrElse("SPARK_GRAFT_MART_DIR",
      System.getProperty("java.io.tmpdir") + "/graft_bench_mart")
    val martNames = (1 to 5).map(i => s"q${i}m")
    val martWanted = onlyEnv.forall(names => martNames.exists(names.contains))
    // names that never produced a runnable query (e.g. the mart
    // materialize crashed) — surfaced in the "failed" list, never
    // silently absent
    var preFailed: Seq[String] = Seq.empty
    val martQs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (!martWanted) Seq.empty
      else try {
        graft.etl.Mart.materialize(spark, sfDir, martDir)
        import graft.etl.{Dashboard, Mart}
        def mt(n: String) = Mart.table(spark, martDir, n)
        Seq(
          "q1m" -> ((_: SparkSession, _: String) =>
            Dashboard.avgByDate(mt(Mart.FactTable), mt("dim_date"))),
          "q2m" -> ((_: SparkSession, _: String) =>
            Dashboard.topNByLocation(mt(Mart.FactTable), mt("dim_location"), 15)),
          "q3m" -> ((_: SparkSession, _: String) =>
            Dashboard.avgByClass(mt(Mart.FactTable))),
          "q4m" -> ((_: SparkSession, _: String) =>
            Dashboard.bandCounts(mt(Mart.FactTable))),
          "q5m" -> ((_: SparkSession, _: String) =>
            Dashboard.pctPositiveByDate(mt(Mart.FactTable))))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] mart materialize failed: ${e.getMessage}")
        preFailed = martNames.filter(n => onlyEnv.forall(_.contains(n)))
        Seq.empty
      }

    val qs0 = (SparkEntry.benchQueries.toSeq ++ martQs).sortBy(_._1)
      .filter { case (n, _) => onlyEnv.forall(_.contains(n)) }

    // Cheap fixed-plan sentinel, timed once per round: its median across
    // rounds calibrates "this host was quiet"; a round where it blows
    // past 3x median was hit by a noise burst and is discarded.
    val sentinelName = "dim_source"

    final case class Sample(round: Int, name: String, sec: Double, ok: Boolean)
    val samples = (1 to iters).flatMap { round =>
      val qSamples = qs0.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { force(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val t = (System.nanoTime() - t0) / 1e9
        dropBlocks()
        System.err.println(f"[bench] round $round $name: $t%.2f${if (ok) "" else " FAILED"}")
        Sample(round, name, t, ok)
      }
      val (sent, sentOk) = {
        val t0 = System.nanoTime()
        val ok =
          try { force(SparkEntry.benchQueries(sentinelName)(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] sentinel failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      dropBlocks()
      System.err.println(f"[bench] round $round sentinel: $sent%.3f${if (sentOk) "" else " FAILED"}")
      qSamples :+ Sample(round, "__sentinel", sent, ok = sentOk)
    }

    // A failed sentinel is a fast-fail time, not a calibration reading:
    // only SUCCESSFUL sentinel runs feed the median, a round whose
    // sentinel failed cannot be certified quiet (treated as noisy), and
    // if no round has a good sentinel, noise filtering is skipped
    // entirely rather than filtered against garbage.
    val sentTimes = samples.filter(s => s.name == "__sentinel" && s.ok)
      .map(s => s.round -> s.sec).toMap
    val noisyRounds =
      if (sentTimes.isEmpty) {
        System.err.println("[bench] sentinel never succeeded; noise filtering skipped")
        Set.empty[Int]
      } else {
        val v = sentTimes.values.toSeq.sorted
        val sentMedian = v(v.size / 2)
        (1 to iters).filter { r =>
          sentTimes.get(r).forall(_ > 3 * sentMedian)
        }.toSet
      }
    if (noisyRounds.nonEmpty)
      System.err.println(s"[bench] discarding noisy rounds: ${noisyRounds.toSeq.sorted.mkString(",")}")

    // Per query: min over ok samples from quiet rounds; if a query has
    // no quiet-round ok sample, fall back to any ok sample; if none,
    // it's failed.
    val results: Seq[(String, Option[Double])] = qs0.map { case (name, _) =>
      val ok = samples.filter(s => s.name == name && s.ok)
      val quiet = ok.filterNot(s => noisyRounds(s.round))
      val pick = if (quiet.nonEmpty) quiet else ok
      name -> (if (pick.nonEmpty) Some(pick.map(_.sec).min) else None)
    }
    val failed = preFailed ++ results.collect { case (n, None) => n }
    val timed = results.collect { case (n, Some(t)) => n -> t }
    val total = timed.map(_._2).sum

    // full-precision detail for humans (stderr — never in the tail budget)
    System.err.println(timed.map { case (n, t) => f"$n=$t%.3f" }.mkString("[bench] detail: ", " ", ""))

    // Compact final line: largest precision that fits the tail budget.
    // "0.1", not r2's "sf0.1"/full path — two chars of budget; the
    // numeric form is self-describing under the "sf" key
    val sfShort = sfDir.split("/").last.stripPrefix("sf")
    def fmt(t: Double, dec: Int): String = {
      val s = BigDecimal(t).setScale(dec, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
      if (s == "-0") "0" else s
    }
    def line(entries: Seq[(String, Double)], f: Double => String,
             shed: Int): String = {
      val qs = entries.map { case (n, t) => "\"" + n + "\":" + f(t) }
        .mkString("{", ",", "}")
      val failedPart =
        if (failed.isEmpty) ""
        else failed.map("\"" + _ + "\"").mkString(",\"failed\":[", ",", "]")
      // shed ladder for REDUNDANT constant fields, dropped only when
      // full query coverage would not otherwise fit: the driver's
      // artifact already records sf in its outer JSON, and the unit is
      // contractually always seconds (both always remain on stderr)
      val totalStr = fmt(total, if (shed >= 2) 0 else 2)
      val unitPart = if (shed >= 2) "" else "\"unit\":\"sec\","
      val sfPart = if (shed >= 1) "" else s""","sf":"$sfShort""""
      s"""{"metric":"total","value":$totalStr,$unitPart"queries":$qs$failedPart$sfPart}"""
    }
    // The driver's capture is the last 2000 chars of stdout, and the r2
    // artifact's tail ends exactly at the line's final char — trailing
    // whitespace is stripped, so the full 2000 belongs to the line;
    // 1996 leaves a 4-char margin.
    val budget = 1996
    // precision ladder: uniform 3/2 decimals, then magnitude-adaptive
    // (sub-second resolution only where it matters), then uniform 1,
    // then progressively integer-seconds for the big values — the last
    // level keeps 1 decimal only under 1s, where a whole-second
    // rounding would erase the measurement entirely
    val levels: Seq[Double => String] = Seq(
      t => fmt(t, 3), t => fmt(t, 2),
      t => if (t < 10) fmt(t, 2) else fmt(t, 1), t => fmt(t, 1),
      t => if (t < 10) fmt(t, 1) else fmt(t, 0),
      t => if (t < 1) fmt(t, 1) else fmt(t, 0))
    // Coverage-first fallback tiers. Tier 1: everything under real
    // names. Tier 2: the PREFERRED dashboard family (SPARK_GRAFT_
    // BENCH_DASH = "inline" | "mart" — both read paths accumulate
    // artifact history across rounds) stands in for both families
    // under self-describing 3-char keys: q1i..q5i = the inline
    // dashboards, q1m..q5m = the materialized-mart twins. A preferred
    // family with no timings (mart materialize crashed, every inline
    // query failed) yields to the SURVIVING family rather than
    // silently dropping all five dashboard timings from the line.
    // Tier 3 (emergency): neither family. Every dropped timing stays
    // in the stderr detail.
    // Family selection: an explicit SPARK_GRAFT_BENCH_DASH wins;
    // otherwise auto-alternate by round parity inferred from the
    // BENCH_r{N}.json artifacts already in the working directory
    // (max N + 1 = this round; even → inline, odd → mart — r4 was
    // inline). Self-contained: nothing outside this process needs to
    // remember to flip an env var for both read paths to accumulate
    // artifact history. Known edges, both benign because the 3-char
    // keys are self-describing and the full detail is on stderr: a
    // RE-RUN after this round's artifact already landed counts as the
    // next round (family flips one round early), and a cwd without
    // artifacts infers round 0 → inline. Set the env to pin a family
    // when that matters.
    val dashPref = sys.env.get("SPARK_GRAFT_BENCH_DASH")
      .map(_.trim.toLowerCase) match {
        case Some("mart") => "mart"
        case Some("inline") => "inline"
        case Some(other) =>
          System.err.println(s"[bench] unknown SPARK_GRAFT_BENCH_DASH '$other'; using inline")
          "inline"
        case None =>
          val rounds = Option(new java.io.File(".").listFiles()).toSeq.flatten
            .flatMap(f => "^BENCH_r(\\d+)\\.json$".r
              .findFirstMatchIn(f.getName).map(_.group(1).toInt))
          val thisRound = if (rounds.isEmpty) 0 else rounds.max + 1
          val fam = if (thisRound % 2 == 1) "mart" else "inline"
          System.err.println(s"[bench] auto family for inferred round $thisRound: $fam")
          fam
      }
    // Tier ladder, monotone in information content: (1) verbatim names;
    // (2) name-compressed, still EVERY distinct timing (legend on
    // stderr) — strictly more coverage than any family shed; (3-4) the
    // dashboard family stand-in, verbatim then compressed; (5-6)
    // emergency: no dashboards. Within a tier the precision/shed
    // ladders run first, so compression engages only once verbatim
    // names cannot fit at ANY precision.
    val shortKey = shortKeys(timed.map(_._1))
    // stand-in keys (q1i/q1m) are not in the map — already 3 chars,
    // pass them through verbatim
    def compress(es: Seq[(String, Double)]) =
      es.map { case (n, t) => shortKey.getOrElse(n, n) -> t }.sortBy(_._1)
    val entryTiers: Seq[(Seq[(String, Double)], Boolean)] = {
      val isMart = (n: String) => "^q[1-5]m$".r.findFirstIn(n).isDefined
      val isDash = (n: String) =>
        "^q[1-5]_".r.findFirstIn(n).isDefined && !isMart(n)
      val base = timed.filterNot(e => isMart(e._1) || isDash(e._1))
      val martFam = timed.filter(e => isMart(e._1))
      val inlineFam = timed.filter(e => isDash(e._1))
        .map { case (n, t) => (s"q${n.charAt(1)}i", t) }
      val standIns = (
        if (dashPref == "mart") { if (martFam.nonEmpty) martFam else inlineFam }
        else { if (inlineFam.nonEmpty) inlineFam else martFam })
        .sortBy(_._1)
      if (standIns.nonEmpty && standIns.head._1.endsWith(if (dashPref == "mart") "i" else "m"))
        System.err.println(s"[bench] preferred family '$dashPref' has no timings; standing in the other")
      val withDash = (base ++ standIns).sortBy(_._1)
      Seq((timed, false), (compress(timed), true),
        (withDash, false), (compress(withDash), true),
        (base, false), (compress(base), true))
    }
    System.err.println(s"[bench] dashboard stand-in family: $dashPref")
    val candidates =
      for ((es, comp) <- entryTiers; shed <- 0 to 2; f <- levels)
        yield (line(es, f, shed), comp)
    val (out, compressed) =
      candidates.find(_._1.length <= budget).getOrElse(candidates.last)
    if (compressed)
      System.err.println(shortKey.toSeq.sortBy(_._1)
        .map { case (n, k) => s"$k=$n" }
        .mkString("[bench] legend: ", " ", ""))
    if (out.length > budget)
      System.err.println(s"[bench] WARNING: JSON line ${out.length} chars exceeds tail budget $budget")
    System.err.println(s"[bench] JSON line length: ${out.length}")
    println(out)
    spark.stop()
  }
}
