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

  /** Distinct word n-gram shingles ("a b c" style) straight from the
    * text, empty-safe — native codegen kernel
    * ([[graft.functions.WordShingles]]).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.wordShingles(text, n)

  /** Declarative (higher-order-function) shingle build, kept as the
    * reference implementation the native kernel is spec-checked
    * against. CodegenFallback — do not use on a hot path.
    */
  def shinglesHof(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), greatest(size(toks), lit(1)))
    val grams = transform(idx, i =>
      when(i + lit(n - 1) <= size(toks), array_join(slice(toks, i, lit(n)), " ")))
    array_distinct(filter(grams, _.isNotNull))
  }

}
