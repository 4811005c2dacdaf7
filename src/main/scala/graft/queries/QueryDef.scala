package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared inventory entry (SURVEY §2): a named Spark query over the
  * driver's testdata dir plus (when SQL-expressible) a DuckDB oracle that must
  * hash-match at sf0.01.
  *
  * Determinism rules for oracle-bearing queries (the driver sorts columns by
  * name then hashes values):
  *  - every computed column aliased identically on both sides;
  *  - doubles always `round(…, n)`; integer sums `CAST(… AS BIGINT)` in DuckDB
  *    (its `sum(int)` is HUGEINT);
  *  - timestamps rendered as strings (`date_format` / `strftime`) or epoch
  *    BIGINT — never raw (ns-vs-µs parquet physical types differ);
  *  - `LIMIT` only under a total order (unique tiebreak key);
  *  - approx aggregates (HLL, approxHistogram) are bench/rows-only: no oracle.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** part of the Bench headline set */
    headline: Boolean = false)

object Tables {
  /** All queries read through here so scans stay prunable parquet reads.
    *
    * The driver's `events.ts` has shipped as several physical parquet types
    * across data regenerations — TIMESTAMP(NANOS) (readable only as a raw
    * long via `nanosAsLong`), and plain `timestamp[us]` with
    * `isAdjustedToUTC=false`, which Spark 4 reads as `TimestampNTZType`.
    * Normalize every shape to session-zoned `TimestampType` here, at the one
    * seam every query reads through, so downstream epoch math (`unix_millis`
    * etc. reject NTZ) always sees one type. The session zone is UTC, so the
    * NTZ→TZ cast is value-identical; the cast is a scan-level projection and
    * does not block filter pushdown on other columns.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
      TimestampNTZType, TimestampType}
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      // raw integer epochs (incl. legacy TIMESTAMP(NANOS) surfaced as long by
      // nanosAsLong): disambiguate unit by magnitude — post-1970 epochs sit
      // ~1.7e9 s / 1.7e12 ms / 1.7e15 µs / 1.7e18 ns, four decades apart, so
      // the rungs are unambiguous for any date between 1971 and 5000+.
      // Integer `div`, not `/`: ns epoch values overflow double precision.
      case Some(LongType | IntegerType) =>
        df.withColumn("ts", expr(
          """CASE WHEN ts >= 100000000000000000 THEN timestamp_micros(ts div 1000)
                  WHEN ts >= 100000000000000    THEN timestamp_micros(ts)
                  WHEN ts >= 1000000000000      THEN timestamp_millis(ts)
                  ELSE timestamp_seconds(ts) END"""))
      // vanilla parquet timestamp[us] (isAdjustedToUTC=false) → NTZ;
      // value-identical under the UTC session zone
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case Some(StringType) =>
        df.withColumn("ts", expr("to_timestamp(ts)"))
      case _ => df
    }
  }
}
