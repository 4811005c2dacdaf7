package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native gear-hash content-defined chunking (FastCDC/rsync family) — the
  * promoted form of the higher-order-function pipeline in
  * `TextQueries.cdcChunkFrame`.
  *
  * Why an Expression: the HOF formulation (split → transform → filter →
  * sequence-filter → transform/substr) is CodegenFallback, so every stage is
  * interpreted per element with boxed rows, and the boundary test re-reads
  * six `element_at`s per position. That made CDC the costliest operator in
  * every scale probe (81.5 s at x100 corpus). This expression is ONE compiled
  * O(L) pass per document: roll the gear hash across the codepoints, record
  * boundaries, slice the chunks — no intermediate arrays of per-char hashes,
  * no boxed lambdas, and the call participates in whole-stage codegen.
  *
  * Semantics (bit-identical to the HOF twin, which is what the DuckDB
  * oracles of `cdc_chunk_stats` / `cdc_containment_pairs` pin):
  *  - per-char gear value g(c) = codepoint(c)·167 + 13;
  *  - with mask = 2^m, a chunk boundary falls after 1-based position i
  *    (i ≥ m, i ≤ L−1) iff Σ_{k=0..m−1} 2^k·g(c_{i−k}) mod 2^m = 0 — the
  *    rolling recurrence h_i = 2·h_{i−1} + g(c_i) truncated to m bits, so the
  *    test depends ONLY on the last m characters and chunk boundaries are
  *    content-anchored (they survive insertions shifting the text);
  *  - chunks partition the text exactly; a doc always yields ≥ 1 chunk
  *    (the empty string yields one empty chunk);
  *  - never a boundary after the last character (no trailing empty chunk).
  *
  * Optional FastCDC-style size clamps (both default off = the plain gear
  * form above): `minLen` suppresses the boundary test until the open chunk
  * has that many characters; `maxLen > 0` forces a boundary once it reaches
  * that many. The windowed hash itself never resets, so min/max only
  * add/remove cut points — with both off the output is exactly the
  * unclamped form.
  *
  * Positions, lengths, and slices are all in CODEPOINTS, matching Spark's
  * `length`/`substr`/`ascii` and DuckDB's `len`/`substr`/`ascii` on the
  * oracle side.
  */
case class GearChunks(child: Expression, mask: Int, minLen: Int, maxLen: Int)
    extends UnaryExpression {

  require(mask >= 2 && (mask & (mask - 1)) == 0,
    s"gear_chunks mask must be a power of two >= 2, got $mask")
  require(minLen >= 0, s"gear_chunks minLen must be >= 0, got $minLen")
  require(maxLen == 0 || maxLen >= math.max(minLen, 1),
    s"gear_chunks maxLen must be 0 (off) or >= max(minLen,1), got $maxLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gear_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gear_chunks expects a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    GearChunks.chunk(input.asInstanceOf[UTF8String], mask, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GearChunks.chunk($c, $mask, $minLen, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunks {

  /** One O(L) pass: roll the m-bit gear hash over the codepoints, collect
    * boundary offsets, slice. Offsets are tracked in both codepoints (the
    * semantic unit) and UTF-16 units (for the substring slices). */
  def chunk(input: UTF8String, mask: Int, minLen: Int, maxLen: Int)
      : GenericArrayData = {
    val str = input.toString
    val n16 = str.length
    val m = Integer.numberOfTrailingZeros(mask)
    val modMask = mask - 1
    // boundary offsets in UTF-16 units (end-exclusive), worst case L/1
    var ends = new Array[Int](8)
    var nEnds = 0
    var h = 0
    var cp = 0        // 0-based codepoint index of the char being read
    var i16 = 0       // its UTF-16 offset
    var chunkStartCp = 0
    while (i16 < n16) {
      val c = str.codePointAt(i16)
      val w16 = Character.charCount(c)
      h = ((h << 1) + (c * 167 + 13)) & modMask
      val isLast = i16 + w16 >= n16
      val clen = cp - chunkStartCp + 1
      val cut = !isLast &&
        ((cp >= m - 1 && h == 0 && clen >= minLen) ||
          (maxLen > 0 && clen >= maxLen))
      if (cut) {
        if (nEnds == ends.length) ends = java.util.Arrays.copyOf(ends, nEnds * 2)
        ends(nEnds) = i16 + w16
        nEnds += 1
        chunkStartCp = cp + 1
      }
      cp += 1
      i16 += w16
    }
    val out = new Array[AnyRef](nEnds + 1)
    var k = 0
    var from = 0
    while (k < nEnds) {
      out(k) = UTF8String.fromString(str.substring(from, ends(k)))
      from = ends(k)
      k += 1
    }
    out(nEnds) = UTF8String.fromString(str.substring(from, n16))
    new GenericArrayData(out)
  }

  /** Column-API entry point (plain gear form, mask 64 like the CDC queries).
    * Requires [[GraftFunctions.register]] to have installed `gear_chunks`. */
  def apply(text: Column, mask: Int = 64, minLen: Int = 0, maxLen: Int = 0): Column =
    org.apache.spark.sql.functions.call_function("gear_chunks", text,
      org.apache.spark.sql.functions.lit(mask),
      org.apache.spark.sql.functions.lit(minLen),
      org.apache.spark.sql.functions.lit(maxLen))
}
