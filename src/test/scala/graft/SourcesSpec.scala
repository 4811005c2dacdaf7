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

  test("parseSpec formats: csv/tsv/regex parse to typed columns, malformed → all-null") {
    val schema = StructType(Seq(
      StructField("ts", StringType), StructField("etype", StringType),
      StructField("value", DoubleType)))
    def raw(lines: String*) =
      lines.toSeq.toDF("s").select(col("s").cast("binary").as("value"))
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))

    val csv = Sources.parseRecords(
      raw("2024-03-01 12:00:00,click,1.5", "garbage-without-commas"),
      schema, ParserSpec(format = "csv"))
    assert(collect(csv).toSeq == Seq(
      ("2024-03-01 12:00:00", "click", 1.5),
      ("garbage-without-commas", null, null))) // partial row: missing fields null

    val tsv = Sources.parseRecords(
      raw("2024-03-01 12:00:00\tview\t2.5"),
      schema, ParserSpec(format = "delimited", delimiter = "\t"))
    assert(collect(tsv).toSeq == Seq(("2024-03-01 12:00:00", "view", 2.5)))

    val rx = Sources.parseRecords(
      raw("[2024-03-01 12:00:00] click value=1.5", "no match at all"),
      schema, ParserSpec(format = "regex",
        pattern = Some("""\[([^\]]+)\] (\w+) value=([0-9.]+)""")))
    assert(collect(rx).toSeq == Seq(
      ("2024-03-01 12:00:00", "click", 1.5),
      (null, null, null))) // non-matching record: all-null, counted by drops

    // column list must match schema order — fail at use, loud
    assert(intercept[IllegalArgumentException] {
      Sources.parseRecords(raw("a,b,1"), schema,
        ParserSpec(format = "csv", columns = Seq("etype", "ts", "value")))
    }.getMessage.contains("must match"))

    // flattenSpec: nested path + root fields, malformed value all-null
    val fl = Sources.parseRecords(
      raw("""{"ts":"2024-03-01 12:00:00","meta":{"kind":"click","v":1.5}}""",
        "not json at all"),
      schema, ParserSpec(flatten = Seq(
        FlattenField("etype", "$.meta.kind"), FlattenField("value", "$.meta.v"))))
    assert(collect(fl).toSeq == Seq(
      ("2024-03-01 12:00:00", "click", 1.5),
      (null, null, null)))

    // spec-JSON round trip: tsv normalizes to delimited + tab
    val spec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "t",
           "parser": {"parseSpec": {
             "format": "tsv",
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["etype"]},
             "columns": ["ts", "etype", "value"]}},
           "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    assert(spec.dataSchema.parser ==
      ParserSpec("delimited", Seq("ts", "etype", "value"), "\t", None))
    assert(intercept[IllegalArgumentException] {
      SpecLoader.fromJson(
        """{"dataSchema": {"dataSource": "t",
             "parser": {"parseSpec": {
               "format": "regex",
               "timestampSpec": {"column": "ts"},
               "dimensionsSpec": {"dimensions": ["d"]}}},
             "metricsSpec": []}}""")
    }.getMessage.contains("pattern"))

    // delimited WITHOUT an explicit delimiter defaults to TAB (upstream
    // DelimitedParseSpec default — comma would silently null every record)
    val delimDefault = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "t",
           "parser": {"parseSpec": {
             "format": "delimited",
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["etype"]}}},
           "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    assert(delimDefault.dataSchema.parser.delimiter == "\t")

    // regex group-count vs schema mismatch fails at WIRING, not first record
    assert(intercept[IllegalArgumentException] {
      Sources.parseRecords(raw("a,b"), schema,
        ParserSpec(format = "regex", pattern = Some("(\\w+),(\\w+)")))
    }.getMessage.contains("capture group"))

    // extractionFn in an ingest filter is refused loudly (silently
    // comparing the raw dimension would be wrong data)
    assert(intercept[IllegalArgumentException] {
      SpecLoader.fromJson(
        """{"dataSchema": {"dataSource": "t",
             "parser": {"parseSpec": {
               "timestampSpec": {"column": "ts"},
               "dimensionsSpec": {"dimensions": ["d"]}}},
             "transformSpec": {"filter": {"type": "selector", "dimension": "d",
               "value": "x", "extractionFn": {"type": "upper"}}},
             "metricsSpec": []}}""")
    }.getMessage.contains("extractionFn"))

    // flattenSpec spec-JSON: path + root forms parse; jq rejected at LOAD
    val flSpec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "t",
           "parser": {"parseSpec": {
             "format": "json",
             "flattenSpec": {"fields": [
               {"type": "path", "name": "etype", "expr": "$.meta.kind"},
               {"type": "root", "name": "ts"}]},
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["etype"]}}},
           "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    assert(flSpec.dataSchema.parser.flatten == Seq(
      FlattenField("etype", "$.meta.kind"), FlattenField("ts", "$.ts")))
    assert(intercept[IllegalArgumentException] {
      SpecLoader.fromJson(
        """{"dataSchema": {"dataSource": "t",
             "parser": {"parseSpec": {
               "format": "json",
               "flattenSpec": {"fields": [{"type": "jq", "name": "x", "expr": ".a"}]},
               "timestampSpec": {"column": "ts"},
               "dimensionsSpec": {"dimensions": ["d"]}}},
             "metricsSpec": []}}""")
    }.getMessage.contains("jq"))
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
