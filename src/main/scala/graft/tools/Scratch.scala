package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** One-off investigation main; contents change freely, never part of
  * the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables(spark, sfDir, "embeddings")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // mirror of embeddingNearDup internals to size each phase
    val bands = 8; val rowsPerBand = 6; val planes = bands * rowsPerBand
    val flat = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), col("d"), col("v").cast("double").as("x"))
    def coef(p: Int): Column =
      (pmod(hash(lit(p), col("d")), lit(10007)).cast("double") / 10007.0) - 0.5
    val projected = flat.groupBy("vec_id").agg(
      sum(col("x") * coef(0)).as("p0"),
      (1 until planes).map(p => sum(col("x") * coef(p)).as(s"p$p")) :+
        sqrt(sum(col("x") * col("x"))).as("nrm"): _*)
    time("projected")(projected.write.mode("overwrite").format("noop").save())
    val banded = projected.select(col("vec_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          hash((b * rowsPerBand until (b + 1) * rowsPerBand).map(p =>
            (col(s"p$p") > 0).cast("int")): _*).as("bucket"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.bucket"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val nCand = time("candidates")(candidates.count())
    println(s"[scratch] candidates = $nCand")
    val full = time("full embeddingNearDup") {
      graft.operators.Similarity.embeddingNearDup(emb).count()
    }
    println(s"[scratch] output pairs = $full")
    spark.stop()
  }
}
