package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct 62-bit hashes of a document's word n-gram shingles,
  * in one native codegen pass — the VERIFICATION-side companion of
  * [[MinHashSig]] that replaces raw shingle-string arrays in every
  * Jaccard-verify join.
  *
  * Why this exists (measured, VERDICT r13 #2): MinHash-LSH candidate
  * verification joins the shingle set of BOTH pair sides onto every
  * candidate row. With string shingles a 3-gram costs ~20+ bytes each
  * (plus UTF8String headers), so at sf10 the verify join shuffled
  * multi-KB array payloads per candidate and spent 2371 s mostly
  * spilling them. The set identity is all Jaccard needs, and an
  * injective-in-practice 62-bit hash carries it in 8 bytes/shingle —
  * the same representation trade [[graft.operators.Dedup.gramTable]]
  * already made for duplicate spans ("span parity barring a 2^-64
  * collision").
  *
  * The hash is the engine-portable pair the rest of the family shares:
  * Horner polynomial over the shingle's UTF-8 bytes, bases 257 and 263
  * mod the Mersenne prime 2^31-1, each avalanched by the bijective
  * 31-bit xorshift-multiply finalizer ([[SimHash64.mix]]), packed as
  * `(h1 << 31) | h2` — every intermediate BIGINT-safe, so a SQL oracle
  * can replay the exact values with the recursive-powers CTE the
  * MinHash oracle already uses. Two distinct shingles collide with
  * probability ~2^-62, in which case the hashed-set Jaccard differs
  * from the string-set Jaccard — the oracles deliberately keep
  * verifying on strings, and parity holds barring that collision (the
  * dedup_substring precedent).
  *
  * Shingle extraction matches [[WordShingles]] exactly (Java
  * `split(" ", -1)` tokenization, distinct shingles, EMPTY array —
  * not null — for documents shorter than n tokens), so swapping the
  * representation cannot change which documents verify. Distinctness
  * is decided at the STRING level before hashing, then the hash array
  * is sorted and adjacent-deduped, so the output is sorted-distinct
  * even across a collision — the contract [[SortedArrayJaccard]]'s
  * merge walk relies on.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  /** 62-bit portable shingle hash: `(mixA(polyA(s)) << 31) | mixB(polyB(s))`. */
  def hash64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h1 = SimHash64.mix(SimHash64.polyHash(bytes, SimHash64.BaseA), 16, 13, 16)
    val h2 = SimHash64.mix(SimHash64.polyHash(bytes, SimHash64.BaseB), 15, 14, 15)
    (h1 << 31) | h2
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[String](toks.length * 2)
    val hashes = new Array[Long](toks.length - n + 1)
    var k = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) { hashes(k) = hash64(s); k += 1 }
      i += 1
    }
    java.util.Arrays.sort(hashes, 0, k)
    // adjacent-dedupe: distinct strings may (2^-62) collide in hash
    val out = new Array[Any](k)
    var m = 0
    var p = 0
    while (p < k) {
      if (m == 0 || out(m - 1).asInstanceOf[Long] != hashes(p)) {
        out(m) = hashes(p); m += 1
      }
      p += 1
    }
    new GenericArrayData(if (m == k) out else out.take(m))
  }
}
