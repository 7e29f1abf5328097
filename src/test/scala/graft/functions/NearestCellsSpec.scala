package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[NearestCells]] — the IVF assignment/probe kernel — to the
  * relational crossJoin + rank-window formulation it replaced, at a
  * REALISTIC quantizer size (1,200 cells: past the point where the
  * window form's corpus×cells fan-out starts to matter, and large
  * enough to exercise every insertion path of the top-n loop).
  */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-vectors (splitmix64-ish mix, no RNG object)
  private def vec(seed: Long, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var x = seed
    var i = 0
    while (i < dim) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      out(i) = ((z.toDouble / Long.MaxValue.toDouble)).toFloat
      i += 1
    }
    out
  }

  private val dim = 16
  private val nCells = 1200
  private val cells = (0 until nCells).map(c => (c.toLong, vec(c * 7919L + 1, dim)))
  private val vecs = (0 until 500).map(v => (v.toLong, vec(v * 104729L + 13, dim)))

  /** The window reference: exact formulation the kernel replaced. */
  private def windowTopN(n: Int) = {
    val centDf = cells.toDF("cell_id", "centroid")
    val vecDf = vecs.toDF("vec_id", "embedding")
    vecDf.crossJoin(centDf)
      .select(col("vec_id"),
        col("cell_id"),
        GraftFunctions.vectorCosine(col("embedding"), col("centroid"))
          .as("cell_sim"))
      .withColumn("r", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cell_sim").desc, col("cell_id"))))
      .filter(col("r") <= n)
      .select("vec_id", "cell_id", "r")
  }

  private def kernelTopN(n: Int) = {
    val ids = cells.map(_._1).toArray
    val flat = new Array[Float](nCells * dim)
    cells.zipWithIndex.foreach { case ((_, c), r) =>
      System.arraycopy(c, 0, flat, r * dim, dim)
    }
    vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        posexplode(GraftFunctions.nearestCells(
          col("embedding"), ids, flat, dim, n)))
      .select(col("vec_id"), col("col").as("cell_id"),
        (col("pos") + 1).as("r"))
  }

  private def assertParity(n: Int): Unit = {
    val ref = windowTopN(n).as[(Long, Long, Int)].collect().toSet
    val got = kernelTopN(n).as[(Long, Long, Int)].collect().toSet
    assert(got == ref, s"kernel/window divergence at n=$n: " +
      s"extra=${(got -- ref).take(5)} missing=${(ref -- got).take(5)}")
  }

  test("argmin assignment (n=1) matches the window form at 1200 cells") {
    assertParity(1)
  }

  test("probe fan (n=4) matches the window form at 1200 cells") {
    assertParity(4)
  }

  test("ties break toward the smaller cell_id, like the window's order") {
    // two IDENTICAL centroids under different ids: cosine ties exactly
    val c = vec(42L, dim)
    val ids = Array(7L, 9L)
    val flat = c ++ c
    val got = Seq((1L, vec(5L, dim))).toDF("vec_id", "embedding")
      .select(GraftFunctions.nearestCells(col("embedding"), ids, flat, dim, 2)
        .as("cells"))
      .as[Seq[Long]].head()
    assert(got == Seq(7L, 9L))
  }

  test("NaN cosine (zero vector) ranks above every real cosine") {
    // cell 3 is the zero centroid -> cosine NaN against any probe; the
    // window form's orderBy(desc) puts NaN first (Spark double order),
    // so the kernel must too
    val ids = Array(3L, 5L)
    val flat = new Array[Float](dim) ++ vec(11L, dim)
    val got = Seq((1L, vec(5L, dim))).toDF("vec_id", "embedding")
      .select(GraftFunctions.nearestCells(col("embedding"), ids, flat, dim, 1)
        .as("cells"))
      .as[Seq[Long]].head()
    assert(got == Seq(3L))
  }

  test("n larger than the cell count returns every cell, ordered") {
    val ids = Array(1L, 2L, 3L)
    val flat = vec(1L, dim) ++ vec(2L, dim) ++ vec(3L, dim)
    val got = Seq((1L, vec(1L, dim))).toDF("vec_id", "embedding")
      .select(GraftFunctions.nearestCells(col("embedding"), ids, flat, dim, 10)
        .as("cells"))
      .as[Seq[Long]].head()
    assert(got.length == 3 && got.head == 1L) // probe == centroid 1
  }

  test("degenerate parameters fail at plan time") {
    val df = Seq((1L, vec(1L, dim))).toDF("vec_id", "embedding")
    intercept[Exception] {
      df.select(GraftFunctions.nearestCells(
        col("embedding"), Array(1L), vec(1L, dim), dim + 1, 1)).collect()
    }
  }
}
