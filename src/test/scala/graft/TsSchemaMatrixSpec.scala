package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Physical-timestamp-schema robustness matrix.
  *
  * The driver regenerates the testdata between rounds and has already shipped
  * `events.ts` as TIMESTAMP(NANOS) (round ≤3) and as vanilla `timestamp[us]`
  * with isAdjustedToUTC=false → TimestampNTZType (round 4, which broke every
  * Pipeline query). This matrix pins the seam: all plausible physical shapes
  * of `ts` must produce IDENTICAL results through [[Tables.t]] for the most
  * timestamp-sensitive queries in the registry — a rollup (granularity
  * truncation), the timestampSpec format family, and the bucketed range join
  * (epoch-µs arithmetic).
  *
  * Base data is truncated to millisecond precision first so every variant
  * (including int64-millis and ISO-string) is value-identical by
  * construction; the invariant under test is schema robustness, not
  * sub-millisecond precision carriage.
  */
class TsSchemaMatrixSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val queryNames =
    Seq("rollup_hour", "timestamp_formats", "range_join_recent_clicks")

  private lazy val base: DataFrame =
    Tables.t(spark, sf, "events")
      .withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
      .cache()

  /** Write `events` with a rewritten ts column into a fresh dir. */
  private def stage(name: String)(reshape: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft_tsmatrix_$name").toString
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    reshape(base).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def results(q: String, dir: String): Seq[String] = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.select(df.columns.sorted.map(c => col(c).cast("string")).toSeq: _*)
      .collect().map(_.mkString("|")).sorted.toSeq
  }

  private lazy val canonicalDir = stage("canonical")(identity)
  private lazy val canonical: Map[String, Seq[String]] =
    queryNames.map(q => q -> results(q, canonicalDir)).toMap

  private val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
    "timestamp_us_ntz" ->
      ((d: DataFrame) => d.withColumn("ts", col("ts").cast("timestamp_ntz"))),
    "timestamp_us_utc_adjusted" -> identity[DataFrame] _,
    "int64_nanos" ->
      ((d: DataFrame) => d.withColumn("ts", expr("unix_micros(ts) * 1000L"))),
    "int64_millis" ->
      ((d: DataFrame) => d.withColumn("ts", unix_millis(col("ts")))),
    "iso_string" ->
      ((d: DataFrame) => d.withColumn("ts",
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")))
  )

  for ((vName, reshape) <- variants; q <- queryNames)
    test(s"$q is invariant to events.ts physical shape: $vName") {
      val dir = stage(vName)(reshape)
      val got = results(q, dir)
      assert(got.nonEmpty, s"$q returned no rows on $vName")
      assert(got == canonical(q),
        s"$q differs on $vName (${got.size} vs ${canonical(q).size} rows)")
    }
}
