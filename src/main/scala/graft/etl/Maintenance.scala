package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-file maintenance: the jobs a 100 TB warehouse runs nightly so
  * the OTHER jobs stay fast.
  *
  * Streaming sinks and incremental loads accrete small files; small
  * files turn a scan into a file-listing + task-scheduling problem
  * (a million 1 MB files is 10^6 tasks of 1 MB each). Compaction
  * rewrites a directory into ~`targetBytes` files. Clustering
  * additionally range-sorts the rows so each output file owns a
  * disjoint key range — then a key-ranged read can skip whole files on
  * parquet footer min/max alone.
  */
object Maintenance {

  /** On-disk byte size of a table directory (metadata-only listing). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
  }

  private def swapInto(spark: SparkSession, dir: String)
                      (write: String => Unit): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compacting")
    write(tmp.toString)
    // local-FS rename swap; an object-store deployment would swap the
    // table pointer in the catalog instead of moving files
    fs.delete(new Path(dir), true)
    fs.rename(tmp, new Path(dir))
  }

  /** Rewrite `dir` into ceil(bytes/targetBytes) files. Uses coalesce —
    * a narrow, shuffle-free merge of existing partitions — because
    * compaction must not pay a cluster-wide shuffle just to glue
    * files together.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): Int = {
    val n = math.max(1, math.ceil(
      dirBytes(spark, dir).toDouble / targetBytes).toInt)
    swapInto(spark, dir) { tmp =>
      spark.read.parquet(dir).coalesce(n)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    n
  }

  /** Compaction + clustering: range-repartition on `sortCols` and sort
    * within each partition, so every output file owns a disjoint range
    * of the leading sort key and carries tight parquet min/max footers.
    * This one DOES shuffle (that is the point — co-locating key ranges
    * is what buys the file skipping); run it on the cadence where the
    * read savings amortize the rewrite.
    */
  def clusterBy(spark: SparkSession, dir: String, sortCols: Seq[String],
                targetBytes: Long = 128L << 20): Int = {
    import org.apache.spark.sql.functions.col
    val n = math.max(1, math.ceil(
      dirBytes(spark, dir).toDouble / targetBytes).toInt)
    swapInto(spark, dir) { tmp =>
      spark.read.parquet(dir)
        .repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    n
  }

  /** Partition retention (TTL): drop `<part>=<value>` partition
    * directories whose integer value is below `minKeep` — the nightly
    * expiry job. Metadata-only: whole partition dirs are unlinked and
    * surviving data is NEVER rewritten (a retention pass that rewrote
    * files would own the cluster's night at 100 TB). Returns the
    * expired partition names, sorted.
    */
  def expirePartitions(spark: SparkSession, dir: String,
                       partCol: String, minKeep: Long): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partCol="
    val expired = fs.listStatus(base).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        p.getName.startsWith(prefix) &&
          p.getName.stripPrefix(prefix).toLongOption.exists(_ < minKeep)
      }
    expired.foreach(p => fs.delete(p, true))
    expired.map(_.getName).sorted
  }

  /** Append a Z-order (Morton) key interleaving the quantized ranks of
    * `cols` — the multi-dimension clustering key. [[clusterBy]] on one
    * key makes files disjoint in THAT key while every other column
    * spans its full range in every file; interleaving the bit planes
    * of per-column quantile buckets gives every listed column locality
    * at once, so a filter on ANY of them (or any subset) skips files
    * on parquet footer min/max.
    *
    * Quantization is rank-based, not equi-width (skew would otherwise
    * crowd the value mass into a few buckets): per-column split points
    * are exact percentiles of a deterministic 1/`sampleMod`
    * content-hash sample — fixed-fraction aggregate state, one 1-row
    * broadcast, no window, no extra shuffle — and each row's bucket is
    * its split-point rank (a `b`-step fold over the broadcast array;
    * `bitsPerCol` ≤ 8 caps it at a 255-element scan per row —
    * interpreted, as all Spark higher-order functions are, which a
    * rewrite job dominated by its shuffle+write absorbs; a hot QUERY
    * path would want a native expression instead). An empty sample
    * degrades to bucket 0 for
    * that column (it simply stops contributing to the ordering); NULLs
    * rank lowest. Columns must be numeric-castable; `bitsPerCol ×
    * cols.size ≤ 62` so the key fits a signed long.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 8,
                 zCol: String = "__z", sampleMod: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty && bitsPerCol >= 1 && bitsPerCol <= 8
      && bitsPerCol * cols.size <= 62, "z key must fit a signed long")
    val b = 1 << bitsPerCol
    val probs = array((1 until b).map(i => lit(i.toDouble / b)): _*)
    val splitAggs = cols.map { c =>
      coalesce(percentile(
        when(pmod(hash(col(c)), lit(sampleMod)) === 0, col(c).cast("double")),
        probs), array().cast("array<double>")).as(s"__sp_$c")
    }
    val splits = df.agg(splitAggs.head, splitAggs.tail: _*)
    val buckets = cols.map { c =>
      aggregate(col(s"__sp_$c"), lit(0L), (acc, s) =>
        acc + when(col(c).cast("double") >= s, 1L).otherwise(0L))
    }
    val z = (0 until bitsPerCol).flatMap { i =>
      buckets.zipWithIndex.map { case (bk, j) =>
        call_function("shiftleft",
          call_function("shiftright", bk, lit(i)).bitwiseAND(lit(1L)),
          lit(i * cols.size + j))
      }
    }.reduce(_ bitwiseOR _)
    df.crossJoin(broadcast(splits))
      .withColumn(zCol, z)
      .drop(cols.map(c => s"__sp_$c"): _*)
  }

  /** [[clusterBy]] in Z-order: rewrite `dir` range-partitioned and
    * sorted on the interleaved key of `cols`, so a selective filter on
    * any of them skips files. Same shuffle-and-rewrite cost model as
    * [[clusterBy]] — run it where multi-column read savings amortize
    * the rewrite; the z key is computational, nothing extra is
    * stored.
    */
  def zOrderBy(spark: SparkSession, dir: String, cols: Seq[String],
               bitsPerCol: Int = 8,
               targetBytes: Long = 128L << 20): Int = {
    import org.apache.spark.sql.functions.col
    val n = math.max(1, math.ceil(
      dirBytes(spark, dir).toDouble / targetBytes).toInt)
    swapInto(spark, dir) { tmp =>
      withZValue(spark.read.parquet(dir), cols, bitsPerCol)
        .repartitionByRange(n, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    n
  }

  /** Per-file [min, max] of `keyCol` — the footer ranges a key-filtered
    * scan skips by. Exposed for tests/inspection.
    */
  def fileRanges(spark: SparkSession, dir: String,
                 keyCol: String): Seq[(String, Long, Long)] = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).cast("long").as("lo"),
        max(col(keyCol)).cast("long").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }
}
