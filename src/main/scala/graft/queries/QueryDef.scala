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
    * `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * unless read as a raw long (`nanosAsLong`); we floor-convert ns → µs into
    * a proper TimestampType column — value-identical to the oracle's native ns
    * reads at every granularity the queries emit (≥ millisecond).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // convert only when ts actually read as a nanos long (re-written copies
    // of the table, e.g. ScaleProbe staging, already carry TimestampType)
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType))
      // integer `div`, not `/`: ns epoch values overflow double precision
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
