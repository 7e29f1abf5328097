package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.operators.Similarity

/** Runs the four embedding near-dup queries at the DENSE-REGIME
  * sign-LSH width (rowsPerBand = 16, the cluster-scale rule pinned by
  * LSH_SCALE.md) and dumps results in Verify's layout, for scale
  * sweeps where the demo regime (6-bit bands = 64 buckets/band, kept
  * ONLY so the DuckDB oracle can replay the planes as SQL literals) is
  * corpus-quadratic by construction: at sf10 (200k vectors, 100-member
  * near-dup cliques) the demo bucket space yields ~2.5e9 candidate
  * pairs — the configuration no 100 TB deployment would run. The
  * outputs are cross-checked by `tools/embedding_check.py`, an
  * independent numpy replay of the same definition (same splitmix64
  * hyperplanes, same bucket rule, same float64 cosine, same
  * keeper/rank/agreement semantics), itself validated against the
  * DuckDB-oracle-verified outputs at sf0.01 in the demo regime.
  *
  * Usage: runMain graft.tools.EmbeddingScale <sfDir> <outDir> [rows]
  */
object EmbeddingScale {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val rowsPerBand = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scale shuffle width with the data, not the host (VERDICT r12 #3)
    System.err.println("[embscale] shuffle partitions: " +
      graft.core.Tuning.autoShufflePartitions(spark, sfDir))

    val emb = Tables(spark, sfDir, "embeddings")
    val runs = Seq(
      "dedup_embedding" -> (() => Similarity.embeddingNearDup(
        emb, bands = 8, rowsPerBand = rowsPerBand)),
      "semdedup" -> (() => Similarity.semanticDedup(
        emb, bands = 8, rowsPerBand = rowsPerBand)),
      "knn_graph" -> (() => Similarity.knnGraph(
        emb, bands = 8, rowsPerBand = rowsPerBand)),
      "label_noise" -> (() => Similarity.labelAgreement(
        emb, bands = 8, rowsPerBand = rowsPerBand)))
    runs.foreach { case (name, mk) =>
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").parquet(s"$outDir/$name")
      System.err.println(
        f"[embscale] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs, r=$rowsPerBand)")
    }
    // Dump the DIRECT DuckDB oracles at THIS geometry (plane literals
    // regenerate at any width), so tools/selfcheck.py gates these
    // outputs exactly like the sf0.01 surface — the numpy replay
    // (tools/embedding_check.py) is retired as the sweep's oracle.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.embeddingOracleSqlAt(8, rowsPerBand)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
