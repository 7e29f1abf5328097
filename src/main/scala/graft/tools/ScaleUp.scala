package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of a driver testdata directory — the
  * local stand-in for a larger scale factor (the driver generates
  * sf ≤ 0.1; the scale claims in SURVEY deserve at least one run
  * against data big enough to trigger AQE skew handling, sketch-path
  * defaults, and spill).
  *
  * Each fact-side table is replicated `factor`× in ONE scan
  * (crossJoin with a tiny replica range) with every key column
  * offset by `replica × 10^8`, so foreign keys stay consistent
  * WITHIN a replica and replicas never collide. The fixed dimensions
  * (region, nation) are copied verbatim — TPC-H semantics: dims
  * don't scale — and fact rows keep their original nation keys, so
  * dimension joins fan exactly as before. Dates/timestamps are kept
  * verbatim: a date at sf1 carries ~10× the rows, which is precisely
  * the per-key-depth growth a real scale-up produces.
  *
  * Text/name/vector payloads get a tiny per-replica perturbation
  * (prefix token / name suffix / ε on one component) so EXACT
  * duplicate detection isn't trivially saturated by the replication
  * itself, while near-dup operators see realistic heavy duplication
  * (each replica group IS a near-dup cluster — the hard case a
  * 100 TB corpus actually presents).
  *
  * Everything is a pure column expression over the source scan —
  * deterministic, re-runnable, no RNG.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val K = 100000000L // per-replica key offset; far above any sf0.1 key

    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    /** Replicate with per-column rewrite rules; unlisted columns pass
      * through verbatim. One scan, `factor`× output, types preserved.
      */
    def replicate(df: DataFrame, rules: Map[String, Column => Column]): DataFrame = {
      val reps = spark.range(factor).select(col("id").as("__rep"))
      val cols = df.columns.map { c =>
        rules.get(c).map(f => f(col(c)).as(c)).getOrElse(col(c))
      }
      df.crossJoin(broadcast(reps)).select(cols.toIndexedSeq: _*)
    }

    val rep = col("__rep")
    /** Key offset preserving the column's original integer type. */
    def off(c: Column) = (c.cast("long") + rep * K).cast("long")
    /** Name/text perturbation: replica 0 verbatim (the original data
      * survives byte-identical), others tagged.
      */
    def tagName(c: Column) = when(rep === 0, c)
      .otherwise(concat(c, lit(" r"), rep.cast("string")))
    def tagText(c: Column) = when(rep === 0, c)
      .otherwise(concat(lit("r"), rep.cast("string"), lit(" "), c))

    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> table("region"),
      "nation" -> table("nation"),
      "customer" -> replicate(table("customer"), Map(
        "c_custkey" -> off, "c_name" -> tagName)),
      "supplier" -> replicate(table("supplier"), Map(
        "s_suppkey" -> off, "s_name" -> tagName)),
      "part" -> replicate(table("part"), Map(
        "p_partkey" -> off, "p_name" -> tagName)),
      "orders" -> replicate(table("orders"), Map(
        "o_orderkey" -> off, "o_custkey" -> off)),
      "lineitem" -> replicate(table("lineitem"), Map(
        "l_orderkey" -> off, "l_partkey" -> off, "l_suppkey" -> off)),
      "events" -> replicate(table("events"), Map(
        "event_id" -> off, "user_id" -> off)),
      "documents" -> replicate(table("documents"), Map(
        "doc_id" -> off, "text" -> tagText)),
      // ε on component 0 keeps replicas near-parallel (cos ≈ 1-ε²/2):
      // semantic dedup sees them as the near-dup clusters they are,
      // while exact float equality no longer holds
      "embeddings" -> replicate(table("embeddings"), Map(
        "vec_id" -> off,
        "embedding" -> (c => when(rep === 0, c).otherwise(
          transform(c, (x, i) =>
            when(i === 0, x + rep.cast("float") * lit(0.001f))
              .otherwise(x).cast("float")))))))

    plans.foreach { case (name, df) =>
      df.coalesce(8).write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
