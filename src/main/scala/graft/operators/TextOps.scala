package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives. Everything here is a pure Column expression —
  * codegen'd per row, no shuffle, no UDF.
  */
object TextOps {

  /** Whitespace tokens. Single-space split keeps parity with the SQL
    * oracle (`string_split(text, ' ')`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles ("a b c" style), empty-safe.
    *
    * Built with higher-order functions so the whole thing stays inside
    * WholeStageCodegen: positions that would run past the end yield NULL
    * and are filtered, avoiding `sequence(1, negative)` pitfalls on
    * short documents.
    */
  def shingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), greatest(size(toks), lit(1)))
    val grams = transform(idx, i =>
      when(i + lit(n - 1) <= size(toks), array_join(slice(toks, i, lit(n)), " ")))
    array_distinct(filter(grams, _.isNotNull))
  }

}
