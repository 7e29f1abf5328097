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
