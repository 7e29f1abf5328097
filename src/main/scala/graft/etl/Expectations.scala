package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Deequ-style
  * rule surface the reference's hand-written validation queries imply —
  * `validate_fact` and `ri_check` are two instances of this engine).
  *
  * Scale shape:
  *  - Every ROW-grain rule over a table (not-null, accepted-values,
  *    in-range, arbitrary predicate) folds into ONE conditional
  *    aggregate, so auditing k rules costs one scan of the table —
  *    never k scans. The aggregate is a partial-combining single row
  *    per partition; no shuffle of data rows.
  *  - `unique` is a key-grain hash aggregate (map-side combined — a
  *    hot key ships one row per map partition, never its posting
  *    list) followed by a rule-sized re-aggregate.
  *  - `relationship` (FK integrity) pre-aggregates the fact side to
  *    distinct keys WITH row counts before the anti-join, so the
  *    shuffle carries |distinct fk| rows, not |fact| rows, and the
  *    orphan ROW count is still exact (sum of the orphan keys'
  *    counts).
  *
  * Output contract (all rule kinds): one row per rule —
  * `(rule, n_checked, n_violations, passed)` — so a 100-rule audit
  * over a 100 TB table lands as 100 rows, order-insensitive,
  * side-effect free.
  */
object Expectations {

  /** A row-grain rule: `violated` must be a boolean Column over the
    * table's columns; NULL counts as violated for `notNull`-style
    * rules only if the rule says so — callers express that in the
    * predicate itself (see the constructors below).
    */
  final case class RowRule(name: String, violated: Column)

  /** Column must be non-null. */
  def notNull(c: String): RowRule =
    RowRule(s"$c.not_null", col(c).isNull)

  /** Column value must be one of `allowed`. dbt's accepted_values
    * ignores NULLs and so does this rule — pair with [[notNull]] to
    * report NULLs distinctly.
    */
  def acceptedValues(c: String, allowed: Seq[String]): RowRule =
    RowRule(s"$c.accepted_values",
      col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Column must lie in [lo, hi] (NULLs pass — see acceptedValues). */
  def inRange(c: String, lo: Double, hi: Double): RowRule =
    RowRule(s"$c.in_range", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Arbitrary row predicate that must HOLD; a NULL predicate result
    * counts as a violation (unknown is not proof of health).
    */
  def satisfies(name: String, predicate: Column): RowRule =
    RowRule(s"$name.satisfies", !coalesce(predicate, lit(false)))

  /** All row-grain rules in ONE scan: a single conditional aggregate
    * produces (violations_0, …, violations_{k-1}, n_rows), then a
    * k-branch `stack` unpivots it to one row per rule. No joins, no
    * window, no second scan.
    */
  def checkRows(df: DataFrame, table: String, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "checkRows needs at least one rule")
    // coalesce: SUM over an EMPTY table is NULL — a zero-row audit
    // must report 0 violations / passed, not a NULL verdict
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(r.violated, 1L).otherwise(0L)), lit(0L)).as(s"__v$i")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // rule/table names are caller-supplied strings spliced into SQL:
    // escape backslashes FIRST (Spark string literals treat \ as an
    // escape — a trailing backslash would swallow the closing quote),
    // then quotes, or a name like "price isn't negative" breaks the
    // stack() parse at runtime
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "''")
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${q(table)}.${q(r.name)}', __n, __v$i" }
      .mkString(", ")
    one.select(expr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_checked, n_violations)"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Key-grain uniqueness: `n_checked` = distinct keys, `n_violations`
    * = keys observed more than once (dbt `unique` semantics). The
    * groupBy is map-side combined; the re-aggregate is rule-sized.
    * NULL keys group together like dbt's (a duplicated NULL key is a
    * real finding).
    */
  def checkUnique(df: DataFrame, table: String, cols: Seq[String]): DataFrame =
    uniqueFromKeyCounts(keyCounts(df, cols), table, cols)

  /** The shared key-count pass several checks can consume: one
    * groupBy over `cols` with the per-key row count `__c` (map-side
    * combined). An audit that PINS this frame and feeds it to
    * [[uniqueFromKeyCounts]] and [[relationshipFromKeyCounts]] pays
    * its scan + keyed exchange ONCE where the standalone
    * checkUnique/checkRelationship pair scans and shuffles the table
    * once per CHECK (guide §2.4). The pin (caller-side, [[graft.core
    * .Pin]]) is what carries the share: exchange reuse alone breaks —
    * Catalyst pushes the relationship's null-key filter below one
    * consumer's aggregate and prunes `__c` off the dim-keys branch,
    * de-canonicalizing the "shared" exchanges (measured at sf0.1: the
    * un-pinned composition recomputed the pass per consumer).
    *
    * `shuffleBy` (default: the full key set) keys the ONE exchange —
    * pass the fk PREFIX of a composite key so the downstream
    * relationship re-aggregate and anti-join find their clustering
    * requirement already satisfied (hash(okey) co-locates
    * (okey, linenumber) groups too) and run exchange-free on the
    * pinned partitions.
    */
  def keyCounts(df: DataFrame, cols: Seq[String],
                shuffleBy: Seq[String] = Nil): DataFrame = {
    val base =
      if (shuffleBy.isEmpty) df else df.repartition(shuffleBy.map(col): _*)
    base.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
  }

  /** [[checkUnique]] over an existing [[keyCounts]] frame. */
  def uniqueFromKeyCounts(kc: DataFrame, table: String,
                          cols: Seq[String]): DataFrame =
    kc.agg(
      count(lit(1)).as("n_checked"),
      coalesce(sum(when(col("__c") > 1L, 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))
      .select(
        lit(s"$table.${cols.mkString("_")}.unique").as("rule"),
        col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))

  /** FK → PK integrity: `n_checked` = fact rows with a non-null FK,
    * `n_violations` = fact ROWS whose key has no match in `dim`
    * (NULL FKs are not orphans — report them via notNull). The fact
    * side aggregates to (key, n_rows) BEFORE the join, so the join
    * input is distinct-key-sized; the anti-join then sums row counts.
    */
  def checkRelationship(fact: DataFrame, table: String, fk: String,
                        dim: DataFrame, pk: String): DataFrame =
    relationshipFromKeyCounts(keyCounts(fact, Seq(fk)), table, fk, dim, pk)

  /** [[checkRelationship]] whose fact side is an existing
    * [[keyCounts]] frame (any key set CONTAINING `fk`): the per-fk
    * row counts re-aggregate from the keyed counts — same sums, and
    * when the kc key equals `fk` the re-aggregate adds no exchange
    * (the child's hash partitioning already satisfies it). `dim` may
    * likewise be a keyCounts frame over `pk`; the distinct on top of
    * it is exchange-free for the same reason. NULL fks drop from the
    * count AFTER the aggregate — key-grain filtering, identical sums
    * to the row-grain pre-filter.
    */
  def relationshipFromKeyCounts(factKc: DataFrame, table: String, fk: String,
                                dim: DataFrame, pk: String): DataFrame = {
    val keys = factKc.filter(col(fk).isNotNull)
      .groupBy(col(fk).as("__k")).agg(sum("__c").as("__c"))
    val dimKeys = dim.select(col(pk).as("__k")).distinct()
    val orphans = keys.join(dimKeys, Seq("__k"), "left_anti")
      .agg(coalesce(sum("__c"), lit(0L)).as("n_violations"))
    keys.agg(coalesce(sum("__c"), lit(0L)).as("n_checked"))
      .crossJoin(orphans)
      .select(
        lit(s"$table.$fk.relationship").as("rule"),
        col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** Union an audit suite into the single report frame. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty,
      "report needs at least one check (a dynamically-assembled suite " +
        "with every rule disabled is a configuration error, not an audit)")
    checks.reduce(_.unionByName(_)).orderBy("rule")
  }
}
