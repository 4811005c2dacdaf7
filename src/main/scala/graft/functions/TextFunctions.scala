package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text-analysis primitives (SURVEY §2.11): tokenization, SimHash
  * fingerprinting, rolling-hash document fingerprint. Higher-order-function
  * compositions only — single pass per document, no shuffle, no UDF.
  */
object TextFunctions {

  /** BPE-ish tokenizer: letter runs, digit runs, single punctuation. */
  val TokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def tokenize(text: Column): Column =
    regexp_extract_all(text, lit(TokenPattern), lit(0))

  def tokenCount(text: Column): Column = size(tokenize(text))

  /** 64-bit SimHash: bit j = majority vote over words of bit j of
    * xxhash64(word); near-dup distance = popcount(a XOR b). Native
    * single-pass implementation ([[SimHash64]]) — requires
    * [[GraftFunctions.register]] (or the GraftExtensions session extension).
    */
  def simhash(text: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash64", text)

  /** Higher-order-function twin of [[simhash]] (64 separate folds; kept as
    * the registration-free reference implementation and for cross-checking
    * the native expression — bit-identical results).
    */
  def simhashHof(text: Column): Column = {
    val words = split(text, " ")
    val bitVals = (0 until 64).map { j =>
      val vote = aggregate(words, lit(0),
        (acc, w) => acc + when(shiftright(xxhash64(w), j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitVals.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling document fingerprint of the word sequence (order sensitive,
    * unlike a bag-of-words hash): left-fold hash chaining
    * h ← xxhash64(h, wᵢ). Chained hashing instead of polynomial mod-2⁶⁴
    * arithmetic: wrap-around multiplication would trip ANSI overflow checks.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(split(text, " "), lit(0L),
      (acc, w) => xxhash64(acc, w))
}
