package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config._
import graft.sources.Sources
import graft.streaming.IngestStream
import graft.time.Granularity

/** End-to-end streaming smoke over REAL testdata: replays the events table as
  * a file stream through the full ingest pipeline (SURVEY §7 minimum slice):
  * parse → timestamp → windowPeriod filter (observed drops) → rollup by
  * (hour, event_type) → segment-partitioned parquet. Prints a one-line JSON
  * summary with {received, sent, dropped, segments, rows}.
  *
  * Usage: runMain graft.tools.StreamSmoke [sfDir] [outDir]
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-smoke").toString)

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spec = IngestionSpec(
      DataSchema("events", TimestampSpec("ts"),
        SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("doubleSum", "total_value", Some("value")),
          AggregatorSpec("hyperUnique", "approx_users", Some("user_id"))),
        GranularitySpec(Granularity.Day, Granularity.Hour)),
      // events span 2024-01; "now" anchored mid-range with a wide window so
      // the run is deterministic (the TestingTimekeeper pattern)
      Tuning(windowPeriod = java.time.Duration.ofDays(10)))

    val source = Sources.eventsReplay(spark, sfDir, s"$outDir/staging")
    val ingest = new IngestStream(spark, spec, s"$outDir/checkpoint")
    val now = to_timestamp(lit("2024-01-15 00:00:00"))
    ingest.start(source, s"$outDir/out", now = now)
    ingest.flushAndStop()

    val out = spark.read.parquet(s"$outDir/out")
    val rows = out.count()
    val segments = out.select("segment").distinct().count()
    println(s"""{"received":${ingest.received},"sent":${ingest.sent},""" +
      s""""dropped":${ingest.dropped},"segments":$segments,"rows":$rows,"out":"$outDir"}""")
    spark.stop()
    assert(rows > 0 && ingest.received == ingest.sent + ingest.dropped,
      "drop-count conservation violated")
  }
}
