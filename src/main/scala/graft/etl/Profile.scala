package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic table profiling: row count + per-column null and distinct
  * counts in ONE aggregate pass over the scan.
  *
  * `exact = false` (the 100 TB default) uses `approx_count_distinct`
  * (HyperLogLog++): every distinct counter is fixed-size mergeable
  * state, so the whole profile is a single partial-aggregating scan
  * with no Expand. `exact = true` is the small-data/audit variant: an
  * exact k-column distinct Expands the scan k+1 ways — fine for a
  * profiling job over a sample or a dimension, wrong as a default over
  * a fact. The exact form is what the DuckDB oracle checks; the approx
  * form is spec-bounded against it (ProfileSpec, within HLL++ rsd).
  */
object Profile {

  def tableProfile(df: DataFrame, cols: Seq[String],
                   exact: Boolean = false, rsd: Double = 0.05): DataFrame = {
    def distinctAgg(c: String) =
      if (exact) count_distinct(col(c))
      else approx_count_distinct(col(c), rsd)
    df.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        distinctAgg(c).as(s"distinct_$c"))): _*)
  }
}
