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

  /** MinHash signature: k independent hash functions over a shingle set.
    * Uses Spark's murmur3 `hash(shingle, seed_i)` as the hash family.
    * Null/empty shingle arrays yield an empty signature.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingleCol, s => hash(s, i))))

  /** 64-bit SimHash over the distinct tokens of a document.
    *
    * Per-bit counters are folded over xxhash64(token) with
    * `aggregate`+`zip_with` — one pass over the tokens, zero shuffles;
    * sign of each counter becomes the output bit.
    */
  def simhash64(toks: Column): Column = {
    val bitRange = sequence(lit(0), lit(63))
    val counters = aggregate(
      array_distinct(toks),
      transform(bitRange, _ => lit(0L)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, bitRange, (c, b) =>
          c + when(call_function("shiftright", h, b.cast("int")).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L))
      })
    aggregate(bitRange, lit(0L), (sig, b) =>
      when(element_at(counters, b.cast("int") + 1) > 0,
        sig.bitwiseOR(call_function("shiftleft", lit(1L), b.cast("int")))).otherwise(sig))
  }
}
