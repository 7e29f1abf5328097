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

  /** Space-joined overlapping character `n`-grams: "abcde" → "abc bcd
    * cde". Texts shorter than `n` come back whole. DECLARATIVE
    * REFERENCE form (sequence + transform + substr) — higher-order
    * functions are CodegenFallback, and any CodegenFallback
    * subexpression knocks the whole projection out of whole-stage
    * codegen even on rows where the branch never fires, so the hot
    * path ([[segmentIfUnspaced]]) uses the native
    * [[graft.functions.SegmentUnspaced]] kernel instead; this form
    * exists to spec-check the kernel against (the shinglesHof
    * precedent).
    */
  def charGramJoin(text: Column, n: Int): Column =
    array_join(
      transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n))), " ")

  /** [[segmentIfUnspaced]]'s declarative reference form — used only by
    * the kernel-parity spec.
    */
  def segmentIfUnspacedHof(text: Column, gram: Int = 3,
                           maxAvgChunk: Int = 16): Column = {
    val nSpaces = length(text) - length(translate(text, " ", ""))
    when(length(text) > maxAvgChunk &&
        length(text) > (nSpaces + 1) * maxAvgChunk,
      charGramJoin(text, gram)).otherwise(text)
  }

  /** Script-aware segmentation — the per-doc space-density switch that
    * keeps the whole whitespace-token stack (token counts, Gopher
    * gate, shingle dedup, retrieval terms) working on scripts that
    * don't delimit words with spaces (CJK, Thai, …). A doc whose
    * average space-separated chunk exceeds `maxAvgChunk` characters
    * is rewritten as overlapping character `gram`-grams joined by
    * single spaces; everything else passes through UNCHANGED, so on a
    * space-delimited corpus this is the identity and every SQL-oracle
    * parity downstream is preserved bit-for-bit.
    *
    * gram = 3 deliberately: character trigrams are the standard CJK
    * retrieval/dedup feature, and the resulting pseudo-tokens have
    * avg_token_len exactly 3 — inside the Gopher gate's [3, 10]
    * window, so length-shaped quality rules stay meaningful instead
    * of rejecting every unsegmented doc as "one giant word".
    * English prose averages ~6 chars/chunk, two orders under the
    * 16-char trigger; only genuinely unsegmented runs flip it.
    */
  def segmentIfUnspaced(text: Column, gram: Int = 3,
                        maxAvgChunk: Int = 16): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.SegmentUnspaced(
        org.apache.spark.sql.graft.Bridge.expression(text), gram, maxAvgChunk))

  /** [[tokens]] over [[segmentIfUnspaced]] — identical to [[tokens]]
    * on space-delimited text, character trigrams on unsegmented
    * scripts.
    */
  def tokensScriptAware(text: Column): Column = tokens(segmentIfUnspaced(text))

  /** Distinct word n-gram shingles ("a b c" style) straight from the
    * text, empty-safe — native codegen kernel
    * ([[graft.functions.WordShingles]]) fed the script-aware
    * segmentation, so unsegmented scripts shingle over character
    * trigrams instead of going blind on one giant "word" (identity on
    * space-delimited text — oracle parity preserved).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.wordShingles(segmentIfUnspaced(text), n)

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
