package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range (interval) join WITHOUT an equi key, made shuffle-joinable.
  *
  * Spark plans `L JOIN R ON r.ts BETWEEN l.ts - d AND l.ts` with no equality
  * conjunct as a BroadcastNestedLoopJoin (or CartesianProduct) — O(|L|·|R|)
  * comparisons, a scale-killer at 100 TB. The standard fix (the same idea
  * behind Flink's interval join and DuckDB's IEJoin bucketing): truncate both
  * sides to time buckets at least as wide as the range span. A right row can
  * then only match left rows in its own or the next bucket, so duplicating
  * each right row into (bucket, bucket+1) turns the range join into an equi
  * join on bucket plus a residual range filter. Cost: 2|R| shuffled rows and
  * per-bucket-pair work instead of |L|·|R| — and the join becomes a plain
  * SortMergeJoin that AQE can skew-split like any other shuffle join.
  *
  * Boundary semantics are Druid/stream-attribution style, half-open:
  * right.ts ∈ [left.ts − span, left.ts).
  */
object RangeJoin {

  /** Join each left row to the right rows whose `rightTs` falls in
    * `[leftTs − spanSeconds, leftTs)`. Column names must be disjoint between
    * the two frames (select/alias before calling). `joinType` supports
    * "inner" and "left_outer" (left rows with no in-range partner survive
    * with nulls — the exploded right side never duplicates an unmatched left
    * row because each left row carries exactly one bucket).
    */
  def trailing(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      spanSeconds: Long,
      joinType: String = "inner"): DataFrame = {
    require(spanSeconds > 0, "spanSeconds must be positive")
    require(Set("inner", "left_outer").contains(joinType),
      s"unsupported joinType $joinType")
    val spanUs = spanSeconds * 1000000L
    // the timestamp cast accepts NTZ input (value-identical under the UTC
    // session zone) — unix_micros alone rejects TIMESTAMP_NTZ
    val lUs = s"unix_micros(cast($leftTs AS timestamp))"
    val rUs = s"unix_micros(cast($rightTs AS timestamp))"
    // floor-div is safe here: test/prod epochs are post-1970 (non-negative)
    val lb = left.withColumn("__rj_b", expr(s"$lUs div $spanUs"))
    // a right row at bucket B can only match left rows in buckets {B, B+1}:
    // left.ts ∈ (right.ts, right.ts + span]
    val rb = right.withColumn("__rj_b",
      explode(array(
        expr(s"$rUs div $spanUs"),
        expr(s"$rUs div $spanUs + 1L"))))
    val residual =
      (col(rightTs) >= col(leftTs) - expr(s"INTERVAL $spanSeconds SECOND")) &&
        (col(rightTs) < col(leftTs))
    lb.join(rb, lb("__rj_b") === rb("__rj_b") && residual, joinType)
      .drop("__rj_b")
  }
}
