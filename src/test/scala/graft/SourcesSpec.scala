package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.config._
import graft.sources.Sources
import graft.streaming.IngestStream
import graft.time.Granularity

/** File-drop source E2E — the HTTP-ingest-server analog (SURVEY §2.1):
  * producers drop NDJSON bodies into a directory (the servlet's
  * newline-delimited-JSON body format), the engine tails it with an explicit
  * schema and runs the full pipeline, replying with {received, sent} counts.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("NDJSON file drop → pipeline → segments with reply counters") {
    val tmp = Files.createTempDirectory("graft-ndjson").toString
    val dropDir = s"$tmp/drop"
    new java.io.File(dropDir).mkdirs()

    val schema = StructType(Seq(
      StructField("ts", StringType),       // ISO strings, like an HTTP body
      StructField("etype", StringType),
      StructField("value", DoubleType)))
    val spec = IngestionSpec(
      DataSchema("http_like", TimestampSpec("ts", "iso"),
        SpecificDimensions(Seq("etype")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("doubleSum", "total", Some("value"))),
        GranularitySpec(Granularity.Hour, Granularity.Hour)),
      Tuning(windowPeriod = java.time.Duration.ofMinutes(30)))

    val source = Sources.jsonFileStream(spark, dropDir, schema)
    val ingest = new IngestStream(spark, spec, s"$tmp/checkpoint")
    ingest.start(source, s"$tmp/out",
      now = to_timestamp(lit("2024-05-01 12:00:00")),
      trigger = Trigger.ProcessingTime(50))

    // first "POST body": 2 in-window + 1 late event
    Files.writeString(Paths.get(s"$dropDir/body1.json"),
      """{"ts": "2024-05-01T12:01:00", "etype": "click", "value": 1.0}
        |{"ts": "2024-05-01T12:02:00", "etype": "click", "value": 2.0}
        |{"ts": "2024-05-01T09:00:00", "etype": "click", "value": 4.0}
        |""".stripMargin)
    ingest.activeQuery.get.processAllAvailable()
    // second body in a separate file (second micro-batch)
    Files.writeString(Paths.get(s"$dropDir/body2.json"),
      """{"ts": "2024-05-01T11:50:00", "etype": "view", "value": 8.0}
        |""".stripMargin)
    ingest.flushAndStop()

    // the servlet reply surface: {"received": n, "sent": m}
    assert(ingest.received == 4 && ingest.sent == 3 && ingest.dropped == 1)

    val merged = graft.sink.SegmentStore.read(spark, s"$tmp/out", spec)
      .select($"etype", $"cnt", $"total").as[(String, Long, Double)].collect().toSet
    assert(merged == Set(("click", 2L, 3.0), ("view", 1L, 8.0)))
  }

  test("production clock path: rate source with processing-time now keeps all rows") {
    val tmp = Files.createTempDirectory("graft-rate").toString
    val spec = IngestionSpec(
      DataSchema("rate_events", TimestampSpec("ts"),
        SpecificDimensions(Seq("etype")),
        Seq(AggregatorSpec("count", "cnt")),
        GranularitySpec(Granularity.Hour, Granularity.Minute)),
      Tuning(windowPeriod = java.time.Duration.ofMinutes(10)))
    // rate source: rows stamped with current event time -> always in-window
    val source = spark.readStream.format("rate")
      .option("rowsPerSecond", 50).load()
      .select(col("timestamp").as("ts"),
        concat(lit("e"), col("value") % 3).as("etype"))
    val ingest = new IngestStream(spark, spec, s"$tmp/checkpoint")
    // default now = current_timestamp(): the production clock
    val q = ingest.start(source, s"$tmp/out",
      trigger = Trigger.ProcessingTime(100))
    // let a few batches flow
    val deadline = System.currentTimeMillis() + 15000
    while (ingest.received < 20 && System.currentTimeMillis() < deadline) {
      q.processAllAvailable(); Thread.sleep(200)
    }
    ingest.flushAndStop()
    assert(ingest.received >= 20, s"rate source produced ${ingest.received}")
    assert(ingest.dropped == 0) // wall-clock event times are inside the window
    assert(ingest.sent == ingest.received)
    assert(spark.read.parquet(s"$tmp/out").agg(sum($"cnt")).as[Long].head()
      == ingest.sent)
  }
}
