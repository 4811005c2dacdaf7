package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DruidQueryCompiler

/** [[graft.queries.DruidQueryCompiler]] — the query-side JSON surface. The
  * oracle-gated behaviors live in DruidNativeQueries; these specs cover the
  * clauses and failure modes SQL can't (or that need crafted inputs):
  * interval exclusion, union datasources, granularity object forms,
  * extraction fns, having composition, limitSpec pagination, scan
  * order/offset, search fragment, first/last aggs at query time, and the
  * rejection contract.
  */
class DruidQuerySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** class-level so spark.implicits can derive its Encoder (the e2e test) */
  case class E(ts: Timestamp, etype: String, value: Double)

  /** 6 rows, 2 users, 3 hours of 2024-03-01. */
  private lazy val events: DataFrame = Seq(
    (ts("2024-03-01 00:10:00"), "click", "alice", 1.0),
    (ts("2024-03-01 00:40:00"), "view", "bob", 2.0),
    (ts("2024-03-01 01:10:00"), "click", "alice", 4.0),
    (ts("2024-03-01 01:20:00"), "click", "bob", 8.0),
    (ts("2024-03-01 02:30:00"), "view", "alice", 16.0),
    (ts("2024-03-01 02:45:00"), "buy", "bob", 32.0)
  ).toDF("__time", "event_type", "user", "value")

  private def resolve(name: String): DataFrame = name match {
    case "events" => events
    case "extra" => Seq((ts("2024-03-01 03:00:00"), "click", "carol", 64.0))
      .toDF("__time", "event_type", "user", "value")
    case other => fail(s"unexpected dataSource $other")
  }

  private def run(json: String): DataFrame =
    DruidQueryCompiler.compile(json, resolve)

  test("intervals exclude rows outside [start, end) — end exclusive") {
    val rows = run("""
      {"queryType": "scan", "dataSource": "events",
       "intervals": ["2024-03-01T00:40:00/2024-03-01T01:20:00"],
       "columns": ["__time", "value"]}""").collect()
    // 00:40 included (start closed), 01:20 excluded (end open)
    assert(rows.map(_.getDouble(1)).sorted.toSeq == Seq(2.0, 4.0))
  }

  test("two intervals OR together") {
    val rows = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "all",
       "intervals": ["2024-03-01T00:00:00/2024-03-01T01:00:00",
                     "2024-03-01T02:00:00/2024-03-01T03:00:00"],
       "aggregations": [{"type": "count", "name": "cnt"}]}""").collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("cnt") == 4L)
  }

  test("union dataSource merges member tables") {
    val rows = run("""
      {"queryType": "timeseries",
       "dataSource": {"type": "union", "dataSources": ["events", "extra"]},
       "granularity": "all",
       "aggregations": [{"type": "count", "name": "cnt"},
                        {"type": "doubleSum", "name": "v", "fieldName": "value"}]}""")
      .collect()
    assert(rows(0).getAs[Long]("cnt") == 7L)
    assert(rows(0).getAs[Double]("v") == 127.0)
  }

  test("granularity object forms: duration millis ≡ named hour; period PT1H too") {
    val byName = run("""
      {"queryType": "timeseries", "dataSource": "events", "granularity": "hour",
       "aggregations": [{"type": "doubleSum", "name": "v", "fieldName": "value"}]}""")
    val byDuration = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": {"type": "duration", "duration": 3600000},
       "aggregations": [{"type": "doubleSum", "name": "v", "fieldName": "value"}]}""")
    val byPeriod = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": {"type": "period", "period": "PT1H"},
       "aggregations": [{"type": "doubleSum", "name": "v", "fieldName": "value"}]}""")
    val expect = Map("2024-03-01 00:00:00.0" -> 3.0,
      "2024-03-01 01:00:00.0" -> 12.0, "2024-03-01 02:00:00.0" -> 48.0)
    Seq(byName, byDuration, byPeriod).foreach { df =>
      val got = df.collect()
        .map(r => r.getTimestamp(0).toString -> r.getDouble(1)).toMap
      assert(got == expect)
    }
  }

  test("non-whole-second duration granularity rejected") {
    val e = intercept[IllegalArgumentException] { run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": {"type": "duration", "duration": 1500}}""") }
    assert(e.getMessage.contains("whole-second"))
  }

  test("extraction fns: regex group, upper, timeFormat, strlen") {
    val rows = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [
         {"type": "extraction", "dimension": "user", "outputName": "initial",
          "extractionFn": {"type": "regex", "expr": "^(.)"}},
         {"type": "extraction", "dimension": "event_type", "outputName": "up",
          "extractionFn": {"type": "upper"}},
         {"type": "extraction", "dimension": "__time", "outputName": "hh",
          "extractionFn": {"type": "timeFormat", "format": "HH"}},
         {"type": "extraction", "dimension": "user", "outputName": "len",
          "extractionFn": {"type": "strlen"}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(r => (r.getAs[String]("initial"), r.getAs[String]("up"),
        r.getAs[String]("hh"), r.getAs[String]("len"), r.getAs[Long]("cnt")))
    assert(rows.contains(("a", "CLICK", "00", "5", 1L)))
    assert(rows.contains(("b", "BUY", "02", "3", 1L)))
  }

  test("timeFormat extraction: timeZone, granularity, asMillis, rejections") {
    def dim(fn: String): Set[String] = run(s"""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "__time",
         "outputName": "x", "extractionFn": $fn}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(_.getAs[String]("x")).toSet
    // format in a zone: 2024-03-01 00:10 UTC is Feb 29 19:10 New York (EST)
    assert(dim("""{"type": "timeFormat", "format": "yyyy-MM-dd HH",
                   "timeZone": "America/New_York"}""") ==
      Set("2024-02-29 19", "2024-02-29 20", "2024-02-29 21"))
    // granularity buckets BEFORE formatting: hour zeroes the minutes
    assert(dim("""{"type": "timeFormat", "format": "HH:mm",
                   "granularity": "hour"}""") ==
      Set("00:00", "01:00", "02:00"))
    // the zone applies to the bucketing CALENDAR too: every event falls in
    // New York's Feb 29, and the day bucket renders as that wall-clock day
    assert(dim("""{"type": "timeFormat", "format": "yyyy-MM-dd HH:mm",
                   "granularity": "day",
                   "timeZone": "America/New_York"}""") ==
      Set("2024-02-29 00:00"))
    // asMillis: the (UTC) day bucket as an epoch-millis string
    assert(dim("""{"type": "timeFormat", "asMillis": true,
                   "granularity": "day"}""") == Set("1709251200000"))
    // locale (r10): a real locale-aware formatter, zone- and
    // granularity-composable — French month names, not silent English
    assert(dim("""{"type": "timeFormat", "format": "MMMM yyyy",
                   "locale": "fr", "granularity": "month"}""") ==
      Set("mars 2024"))
    // the locale formatter renders the instant IN the requested zone:
    // every event is Feb 29 in New York → « février », and German
    // day-of-week over the day bucket
    assert(dim("""{"type": "timeFormat", "format": "MMMM",
                   "locale": "fr", "timeZone": "America/New_York"}""") ==
      Set("février"))
    assert(dim("""{"type": "timeFormat", "format": "EEEE",
                   "locale": "de", "granularity": "day"}""") ==
      Set("Freitag"))
    // zone patterns are LEGAL on the locale path (real zoned formatting,
    // not the rebase) and render the REQUESTED zone
    assert(dim("""{"type": "timeFormat", "format": "HH z", "locale": "en",
                   "timeZone": "America/New_York"}""") ==
      Set("19 EST", "20 EST", "21 EST"))
    // legacy underscore tags resolve; garbage tags are loud
    assert(dim("""{"type": "timeFormat", "format": "MMMM",
                   "locale": "fr_FR"}""") == Set("mars"))
    assert(intercept[IllegalArgumentException] {
      dim("""{"type": "timeFormat", "format": "MMMM", "locale": "!!"}""")
    }.getMessage.contains("locale"))
    assert(intercept[IllegalArgumentException] {
      dim("""{"type": "timeFormat", "asMillis": true, "locale": "fr"}""")
    }.getMessage.contains("locale"))
    assert(intercept[IllegalArgumentException] {
      dim("""{"type": "timeFormat", "asMillis": true, "format": "HH"}""")
    }.getMessage.contains("asMillis"))
    assert(intercept[IllegalArgumentException] {
      dim("""{"type": "timeFormat", "timeZone": "Mars/Olympus"}""")
    }.getMessage.contains("timeZone"))
    // a zone PATTERN with a non-UTC zone would render the session zone's
    // name against the shifted wall clock — loud; quoted literals pass
    assert(intercept[IllegalArgumentException] {
      dim("""{"type": "timeFormat", "format": "HH:mm z",
              "timeZone": "America/New_York"}""")
    }.getMessage.contains("zone patterns"))
    assert(dim("""{"type": "timeFormat", "format": "HH'Z'mm",
                   "timeZone": "America/New_York"}""") ==
      Set("19Z10", "19Z40", "20Z10", "20Z20", "21Z30", "21Z45"))
  }

  test("regex extraction non-match keeps input; replaceMissingValue nulls it") {
    val keep = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "user",
         "outputName": "x",
         "extractionFn": {"type": "regex", "expr": "^(z.*)"}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(_.getAs[String]("x")).toSet
    assert(keep == Set("alice", "bob")) // no z-names: inputs kept
    val replaced = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "user",
         "outputName": "x",
         "extractionFn": {"type": "regex", "expr": "^(z.*)",
           "replaceMissingValue": true, "replaceMissingValueWith": "?"}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(_.getAs[String]("x")).toSet
    assert(replaced == Set("?"))
  }

  test("lookup extractionFn: map hit, retainMissingValue, replaceWith") {
    def groups(fn: String): Map[String, Long] = run(s"""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "event_type",
         "outputName": "kind", "extractionFn": $fn}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(r => ("" + r.getAs[String]("kind")) -> r.getAs[Long]("cnt"))
      .toMap
    val base = """{"type": "lookup",
      "lookup": {"type": "map", "map": {"click": "engage", "view": "engage"}}"""
    // default: misses → null
    assert(groups(base + "}") == Map("engage" -> 5L, "null" -> 1L))
    // retainMissingValue: misses keep the input
    assert(groups(base + ""","retainMissingValue": true}""") ==
      Map("engage" -> 5L, "buy" -> 1L))
    // replaceMissingValueWith
    assert(groups(base + ""","replaceMissingValueWith": "other"}""") ==
      Map("engage" -> 5L, "other" -> 1L))
  }

  test("having: and/not composition + filter-type having on dimension output") {
    val rows = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["event_type"],
       "aggregations": [{"type": "count", "name": "cnt"},
                        {"type": "doubleSum", "name": "v", "fieldName": "value"}],
       "having": {"type": "and", "havingSpecs": [
         {"type": "greaterThan", "aggregation": "cnt", "value": 1},
         {"type": "not", "havingSpec":
           {"type": "equalTo", "aggregation": "v", "value": 18.0}}]}}""")
      .collect()
    // click: cnt=3 v=13; view: cnt=2 v=18 (excluded by not-equalTo); buy: cnt=1
    assert(rows.map(_.getAs[String]("event_type")).toSeq == Seq("click"))

    val viaFilter = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["event_type"],
       "aggregations": [{"type": "count", "name": "cnt"}],
       "having": {"type": "filter", "filter":
         {"type": "like", "dimension": "event_type", "pattern": "%i%"}}}""")
      .collect().map(_.getAs[String]("event_type")).toSet
    assert(viaFilter == Set("click", "view"))

    // dimSelector having: dimension-output equality
    val viaDim = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["event_type"],
       "aggregations": [{"type": "count", "name": "cnt"}],
       "having": {"type": "dimSelector", "dimension": "event_type",
                  "value": "buy"}}""")
      .collect().map(_.getAs[String]("event_type")).toSeq
    assert(viaDim == Seq("buy"))
  }

  test("limitSpec: metric order + offset pagination is deterministic") {
    def page(offset: Int) = run(s"""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["user", "event_type"],
       "aggregations": [{"type": "doubleSum", "name": "v", "fieldName": "value"}],
       "limitSpec": {"type": "default", "limit": 2, "offset": $offset,
         "columns": [{"dimension": "v", "direction": "descending"}]}}""")
      .collect().map(r => (r.getAs[String]("user"), r.getAs[Double]("v"))).toSeq
    // groups: bob/buy 32, alice/view 16, bob/click 8, alice/click 5, bob/view 2
    assert(page(0) == Seq(("bob", 32.0), ("alice", 16.0)))
    assert(page(2) == Seq(("bob", 8.0), ("alice", 5.0)))
    assert(page(4) == Seq(("bob", 2.0)))
  }

  test("topN: dimension-ordering metric; lexicographic inverted") {
    val lex = run("""
      {"queryType": "topN", "dataSource": "events", "granularity": "all",
       "dimension": "event_type", "threshold": 2,
       "metric": {"type": "dimension"},
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(_.getAs[String]("event_type")).toSeq
    assert(lex == Seq("buy", "click"))
    val inv = run("""
      {"queryType": "topN", "dataSource": "events", "granularity": "all",
       "dimension": "event_type", "threshold": 2,
       "metric": {"type": "inverted", "metric": {"type": "dimension"}},
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(_.getAs[String]("event_type")).toSeq
    assert(inv == Seq("view", "click"))
  }

  test("first/last aggregators work at query time (RawTs plumbing), " +
      "finalized to plain values in the response") {
    val rows = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["user"],
       "aggregations": [
         {"type": "doubleFirst", "name": "first_v", "fieldName": "value"},
         {"type": "doubleLast", "name": "last_v", "fieldName": "value"}]}""")
      .collect().map(r => r.getAs[String]("user") ->
        (r.getAs[Double]("first_v"), r.getAs[Double]("last_v"))).toMap
    assert(rows("alice") == (1.0, 16.0))
    assert(rows("bob") == (2.0, 32.0))
  }

  test("context.finalize=false keeps the raw (t, v) partials") {
    val rows = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["user"], "context": {"finalize": false},
       "aggregations": [
         {"type": "doubleFirst", "name": "first_v", "fieldName": "value"}]}""")
      .collect().map(r => r.getAs[String]("user") ->
        r.getAs[org.apache.spark.sql.Row]("first_v").getAs[Double]("v")).toMap
    assert(rows("alice") == 1.0 && rows("bob") == 2.0)
  }

  test("scan: descending time order with offset, and column projection") {
    val rows = run("""
      {"queryType": "scan", "dataSource": "events",
       "columns": ["__time", "value"], "order": "descending",
       "offset": 1, "limit": 2}""").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(16.0, 8.0))
    assert(rows.head.schema.fieldNames.toSeq == Seq("__time", "value"))
  }

  test("search: fragment requires every fragment; case sensitivity honored") {
    val frag = run("""
      {"queryType": "search", "dataSource": "events",
       "searchDimensions": ["event_type", "user"],
       "query": {"type": "fragment", "values": ["i", "c"]}}""")
      .collect().map(r => (r.getAs[String]("dimension"), r.getAs[String]("value"),
        r.getAs[Long]("cnt"))).toSet
    // "click" has i+c (3 rows); "alice" has i+c (3 rows); "view" lacks c
    assert(frag == Set(("event_type", "click", 3L), ("user", "alice", 3L)))
    val sensitive = run("""
      {"queryType": "search", "dataSource": "events",
       "searchDimensions": ["event_type"],
       "query": {"type": "contains", "value": "CLICK", "caseSensitive": true}}""")
      .collect()
    assert(sensitive.isEmpty)
  }

  test("timeBoundary minTime-only bound") {
    val rows = run("""
      {"queryType": "timeBoundary", "dataSource": "events",
       "bound": "minTime"}""").collect()
    assert(rows(0).schema.fieldNames.toSeq == Seq("minTime"))
    assert(rows(0).getTimestamp(0) == ts("2024-03-01 00:10:00"))
  }

  test("end-to-end: ingestion-spec JSON → segments → native query JSON") {
    import graft.config._
    import graft.streaming.IngestStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext

    // the Druid deployment shape: tranquility ingests with a spec, Druid
    // answers query JSON over the rolled-up segments. Query-time count over
    // rollup counts SEGMENT rows (Druid's rule) — event counts come from
    // longSum of the ingest-time count metric, exactly as in Druid.
    val spec = SpecLoader.fromJson("""
      {"dataSchema": {
         "dataSource": "e2e",
         "parser": {"parseSpec": {
           "timestampSpec": {"column": "ts"},
           "dimensionsSpec": {"dimensions": ["etype"]}}},
         "metricsSpec": [{"type": "count", "name": "cnt"},
                         {"type": "doubleSum", "name": "total", "fieldName": "value"}],
         "granularitySpec": {"segmentGranularity": "HOUR",
                             "queryGranularity": "HOUR"}},
       "tuning": {"windowPeriod": "PT2H"}}""")
    val input = MemoryStream[E]
    val tmp = java.nio.file.Files.createTempDirectory("graft-dq-e2e").toString
    val ingest = new IngestStream(spark, spec, s"$tmp/checkpoint")
    ingest.start(input.toDF(), s"$tmp/out", now = lit(ts("2024-03-01 12:00:00")),
      trigger = Trigger.ProcessingTime(50))
    input.addData(E(ts("2024-03-01 12:01:00"), "click", 1.0),
      E(ts("2024-03-01 12:02:00"), "click", 2.0))
    ingest.activeQuery.get.processAllAvailable()
    // same (bucket, dim) lands again in a second micro-batch → partials
    input.addData(E(ts("2024-03-01 12:03:00"), "click", 4.0),
      E(ts("2024-03-01 13:03:00"), "view", 8.0))
    ingest.flushAndStop()

    val store = graft.sink.SegmentStore
      .read(spark, s"$tmp/out", spec)
      .withColumnRenamed(graft.pipeline.Pipeline.TsCol,
        DruidQueryCompiler.TimeCol)
      .drop(graft.pipeline.Pipeline.SegmentCol)
    val rows = DruidQueryCompiler.compile("""
      {"queryType": "timeseries", "dataSource": "e2e", "granularity": "hour",
       "aggregations": [{"type": "longSum", "name": "events", "fieldName": "cnt"},
                        {"type": "doubleSum", "name": "total", "fieldName": "total"}]}""",
      Map("e2e" -> store)).collect()
      .map(r => r.getTimestamp(0).toString ->
        (r.getAs[Long]("events"), r.getAs[Double]("total"))).toMap
    assert(rows == Map(
      "2024-03-01 12:00:00.0" -> (3L, 7.0),
      "2024-03-01 13:00:00.0" -> (1L, 8.0)))
  }

  test("query dataSource: scan over an inner groupBy result; rejections") {
    val rows = run("""
      {"queryType": "scan",
       "dataSource": {"type": "query", "query": {
         "queryType": "groupBy", "dataSource": "events",
         "granularity": "all", "dimensions": ["event_type"],
         "aggregations": [{"type": "doubleSum", "name": "sv",
                           "fieldName": "value"}]}},
       "columns": ["event_type", "sv"]}""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows == Map("click" -> 13.0, "view" -> 18.0, "buy" -> 32.0))
    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "timeseries",
       "dataSource": {"type": "query"}, "granularity": "all"}""")
    }.getMessage.contains("needs a query"))
  }

  test("select: paging round-trip — page 2 resumes exactly after page 1") {
    def page(ids: String): Seq[(String, Long, Double)] = run(s"""
      {"queryType": "select", "dataSource": "events",
       "granularity": "all",
       "intervals": ["2024-03-01T00:00:00/2024-03-02T00:00:00"],
       "dimensions": ["event_type"], "metrics": ["value"],
       "pagingSpec": {"pagingIdentifiers": {$ids}, "threshold": 3}}""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4))).toSeq
    val p1 = page("")
    // one synthetic day segment, ascending offsets from 0, time order
    assert(p1 == Seq(("events_2024-03-01", 0L, 1.0),
      ("events_2024-03-01", 1L, 2.0), ("events_2024-03-01", 2L, 4.0)))
    // feed back the last offset per segment — upstream fromNext contract
    val ids = p1.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).max }
    val p2 = page(ids.map { case (s, o) => s""""$s": $o""" }.mkString(","))
    assert(p2 == Seq(("events_2024-03-01", 3L, 8.0),
      ("events_2024-03-01", 4L, 16.0), ("events_2024-03-01", 5L, 32.0)))
    // fromNext=false: the caller pre-advanced, the offset itself returns
    val p2eq = run("""
      {"queryType": "select", "dataSource": "events",
       "intervals": ["2024-03-01T00:00:00/2024-03-02T00:00:00"],
       "dimensions": ["event_type"], "metrics": ["value"],
       "pagingSpec": {"pagingIdentifiers": {"events_2024-03-01": 3},
                      "fromNext": false, "threshold": 2}}""")
      .collect().map(_.getLong(1)).toSeq
    assert(p2eq == Seq(3L, 4L))
    // identifiers naming absent segments are inert
    assert(page("\"events_1999-01-01\": 7") == p1)
  }

  test("select: descending negative offsets; empty dims+metrics = all cols") {
    val rows = run("""
      {"queryType": "select", "dataSource": "events", "descending": true,
       "intervals": ["2024-03-01T00:00:00/2024-03-02T00:00:00"],
       "pagingSpec": {"pagingIdentifiers": {}, "threshold": 2}}""")
    // all data columns projected after segmentId/offset/__time
    assert(rows.columns.toSeq ==
      Seq("segmentId", "offset", "__time", "event_type", "user", "value"))
    val got = rows.collect().map(r => (r.getLong(1), r.getDouble(5))).toSeq
    // newest first, offsets -1, -2 (upstream's descending convention)
    assert(got == Seq((-1L, 32.0), (-2L, 16.0)))
    // resume: everything at or past -2 is consumed, page 2 starts at -3
    val p2 = run("""
      {"queryType": "select", "dataSource": "events", "descending": true,
       "intervals": ["2024-03-01T00:00:00/2024-03-02T00:00:00"],
       "pagingSpec": {"pagingIdentifiers": {"events_2024-03-01": -2},
                      "threshold": 2}}""")
      .collect().map(r => (r.getLong(1), r.getDouble(5))).toSeq
    assert(p2 == Seq((-3L, 8.0), (-4L, 4.0)))
  }

  test("select paging tiles the corpus exactly — every threshold, both directions") {
    for (threshold <- 1 to 4; desc <- Seq(false, true)) {
      var ids = Map.empty[String, Long]
      var seen = Vector.empty[(String, Long, Double)]
      var done = false
      var guard = 0
      while (!done && guard < 12) {
        guard += 1
        val idJson = ids.map { case (s, o) => s""""$s": $o""" }.mkString(",")
        val page = run(s"""
          {"queryType": "select", "dataSource": "events",
           "descending": $desc,
           "intervals": ["2024-03-01T00:00:00/2024-03-02T00:00:00"],
           "dimensions": ["event_type"], "metrics": ["value"],
           "pagingSpec": {"pagingIdentifiers": {$idJson},
                          "threshold": $threshold}}""")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
        if (page.isEmpty) done = true
        else {
          seen ++= page
          // feed back the furthest offset per segment, upstream-client style
          page.groupBy(_._1).foreach { case (s, rs) =>
            ids += s -> (if (desc) rs.map(_._2).min else rs.map(_._2).max)
          }
        }
      }
      val want = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0)
      assert(seen.map(_._3) == (if (desc) want.reverse else want),
        s"threshold=$threshold desc=$desc: $seen")
      // offsets contiguous from 0 (ascending) / −1 (descending): no row is
      // ever skipped or double-served across page boundaries
      assert(seen.map(_._2) ==
        (if (desc) (1 to 6).map(i => -i.toLong) else (0 to 5).map(_.toLong)),
        s"threshold=$threshold desc=$desc: $seen")
    }
  }

  test("select rejections: threshold, granularity, pagingSpec") {
    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "select", "dataSource": "events",
       "pagingSpec": {"pagingIdentifiers": {}}}""")
    }.getMessage.contains("threshold"))
    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "select", "dataSource": "events", "granularity": "day",
       "pagingSpec": {"pagingIdentifiers": {}, "threshold": 5}}""")
    }.getMessage.contains("granularity 'all'"))
    assert(intercept[IllegalArgumentException] { run(
      """{"queryType": "select", "dataSource": "events"}""")
    }.getMessage.contains("pagingSpec"))
  }

  test("rejections: unknown type, missing __time, bad metric") {
    assert(intercept[IllegalArgumentException] { run(
      """{"queryType": "mystery", "dataSource": "events"}""")
    }.getMessage.contains("unsupported queryType"))
    assert(intercept[IllegalArgumentException] {
      DruidQueryCompiler.compile(
        """{"queryType": "timeseries", "dataSource": "x", "granularity": "all"}""",
        _ => Seq((1, "a")).toDF("id", "name"))
    }.getMessage.contains("__time"))
    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "topN", "dataSource": "events", "granularity": "all",
       "dimension": "user", "threshold": 1,
       "metric": {"type": "carto"},
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
    }.getMessage.contains("metric type"))
  }

  test("filters with extractionFn: selector/in/bound compare the extracted value") {
    def cnt(filter: String): Long = run(s"""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "all", "filter": $filter,
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select("cnt").head.getLong(0)
    // substring(0,2): click/view/buy → cl/vi/bu
    assert(cnt("""{"type": "selector", "dimension": "event_type", "value": "cl",
                   "extractionFn": {"type": "substring", "index": 0, "length": 2}}""") == 3L)
    // upper(): IN over extracted uppercase
    assert(cnt("""{"type": "in", "dimension": "event_type",
                   "values": ["VIEW", "BUY"],
                   "extractionFn": {"type": "upper"}}""") == 3L)
    // bound over strlen-as-string? lexicographic bound over upper()
    assert(cnt("""{"type": "bound", "dimension": "event_type",
                   "lower": "B", "upper": "C",
                   "extractionFn": {"type": "upper"}}""") == 1L) // BUY only
    // composition: not(extraction selector) — plain subtree + extraction mix
    assert(cnt("""{"type": "and", "fields": [
        {"type": "not", "field": {"type": "selector", "dimension": "event_type",
          "value": "cl",
          "extractionFn": {"type": "substring", "index": 0, "length": 2}}},
        {"type": "selector", "dimension": "user", "value": "bob"}]}""") == 2L)
    // extractionFn on an unsupported filter type rejected
    assert(intercept[IllegalArgumentException] {
      cnt("""{"type": "regex", "dimension": "event_type", "pattern": "c.*",
             "extractionFn": {"type": "upper"}}""")
    }.getMessage.contains("not supported"))
  }

  test("skipEmptyBuckets=false: empty buckets emit zero sums, null min; needs intervals") {
    val out = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "hour",
       "intervals": ["2024-03-01T00:00:00/2024-03-01T04:00:00"],
       "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
       "context": {"skipEmptyBuckets": false},
       "aggregations": [{"type": "count", "name": "cnt"},
                        {"type": "doubleSum", "name": "sv", "fieldName": "value"},
                        {"type": "doubleMin", "name": "mn", "fieldName": "value"}]}""")
      .orderBy(col("__time"))
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    // clicks at 00 (1.0), 01 (4.0, 8.0); hours 02 and 03 are EMPTY but emit
    assert(out.toSeq == Seq((1L, 1.0, 1.0), (2L, 12.0, 4.0),
      (0L, 0.0, null), (0L, 0.0, null)))

    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "hour", "context": {"skipEmptyBuckets": false},
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
    }.getMessage.contains("intervals"))
  }

  test("registeredLookup: name resolves through the registry; unknown name rejected") {
    graft.queries.Lookups.register("dept",
      Map("click" -> "engagement", "view" -> "engagement"))
    try {
      val out = run("""
        {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
         "dimensions": [
           {"type": "extraction", "dimension": "event_type",
            "outputName": "dept",
            "extractionFn": {"type": "registeredLookup", "lookup": "dept"}}],
         "aggregations": [{"type": "count", "name": "cnt"}]}""")
        .select("dept", "cnt")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // click×3 + view×2 map; buy has no entry → null (Druid's default miss)
      assert(out == Map("engagement" -> 5L, (null: String) -> 1L))
    } finally graft.queries.Lookups.unregister("dept")
    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "event_type",
         "outputName": "d",
         "extractionFn": {"type": "registeredLookup", "lookup": "dept"}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
    }.getMessage.contains("not registered"))
  }

  test("LOOKUP() SQL function resolves the registry; miss → null; bad name errors") {
    graft.functions.GraftFunctions.register(spark)
    graft.queries.Lookups.register("dept_sql", Map("click" -> "engagement"))
    try {
      events.createOrReplaceTempView("lookup_events")
      val rows = spark.sql(
        """SELECT lookup(event_type, 'dept_sql') AS dept, count(*) AS cnt
           FROM lookup_events GROUP BY 1""")
        .collect().map(r => Option(r.getString(0)).orNull -> r.getLong(1)).toMap
      assert(rows == Map("engagement" -> 3L, (null: String) -> 3L))
      assert(intercept[Exception] {
        spark.sql("SELECT lookup(event_type, 'nope') FROM lookup_events").collect()
      }.getMessage.contains("not registered"))
    } finally graft.queries.Lookups.unregister("dept_sql")
  }

  test("segmentMetadata: per-column stats, null counting, bad column rejected") {
    val src = Seq((ts("2024-03-01 00:00:00"), "a", Some(1L)),
      (ts("2024-03-01 01:00:00"), "b", None),
      (ts("2024-03-01 02:00:00"), "a", Some(5L)))
      .toDF("__time", "d", "v")
    val out = DruidQueryCompiler.compile(
      """{"queryType": "segmentMetadata", "dataSource": "t",
          "columns": ["d", "v"]}""", _ => src)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out("d") == (("string", 2L, "a", "b", 0L, 3L)))
    assert(out("v") == (("bigint", 2L, "1", "5", 1L, 3L)))
    assert(intercept[IllegalArgumentException] {
      DruidQueryCompiler.compile(
        """{"queryType": "segmentMetadata", "dataSource": "t",
            "columns": ["nope"]}""", _ => src)
    }.getMessage.contains("does not exist"))
  }

  test("movingAverage: backward extension + zero-fill + rejections") {
    // hourly data at 00,01,02 of 2024-03-01; query interval starts at 02 —
    // the first emitted bucket's window must see 00/01 (backward extension),
    // and 03 (no data) must emit with zero-filled aggs
    val out = run("""
      {"queryType": "movingAverage", "dataSource": "events",
       "granularity": "hour",
       "intervals": ["2024-03-01T02:00:00/2024-03-01T04:00:00"],
       "aggregations": [{"type": "doubleSum", "name": "sv", "fieldName": "value"}],
       "averagers": [{"type": "doubleMean", "name": "ma3", "fieldName": "sv",
                      "buckets": 3}]}""")
      .orderBy(col("__time"))
      .select(date_format(col("__time"), "HH:mm").as("h"), col("sv"), col("ma3"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // hours: 00→3.0, 01→12.0, 02→48.0, 03→0 (zero-filled)
    assert(out.toSeq == Seq(
      ("02:00", 48.0, (3.0 + 12.0 + 48.0) / 3),
      ("03:00", 0.0, (12.0 + 48.0 + 0.0) / 3)))

    // calendar granularity (supported since r6): the 2-month window steps
    // back one CALENDAR month (Feb has no rows → zero in the mean)
    val monthly = run("""
      {"queryType": "movingAverage", "dataSource": "events",
       "granularity": "month",
       "intervals": ["2024-03-01T00:00:00/2024-04-01T00:00:00"],
       "aggregations": [{"type": "count", "name": "c"}],
       "averagers": [{"type": "doubleMean", "name": "m", "fieldName": "c",
                      "buckets": 2}]}""")
      .select(date_format(col("__time"), "yyyy-MM-dd").as("b"),
        col("c"), col("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(monthly == Seq(("2024-03-01", 6L, 3.0)), monthly)
    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "movingAverage", "dataSource": "events",
       "granularity": "hour",
       "intervals": ["2024-03-01T00:00:00/2024-03-01T02:00:00"],
       "aggregations": [{"type": "count", "name": "c"}]}""")
    }.getMessage.contains("averagers"))
  }

  test("movingAverage averager set: Mean vs MeanNoNulls, constant, rejections") {
    // doubleMax is null on the empty 03:00 bucket: Mean imputes 0 over the
    // FULL window; MeanNoNulls divides by non-null buckets only
    val out = run("""
      {"queryType": "movingAverage", "dataSource": "events",
       "granularity": "hour",
       "intervals": ["2024-03-01T02:00:00/2024-03-01T04:00:00"],
       "aggregations": [{"type": "doubleMax", "name": "mx", "fieldName": "value"}],
       "averagers": [
         {"type": "doubleMean", "name": "mean2", "fieldName": "mx", "buckets": 2},
         {"type": "doubleMeanNoNulls", "name": "mnn2", "fieldName": "mx", "buckets": 2},
         {"type": "constant", "name": "c7", "value": 7.5}]}""")
      .orderBy(col("__time"))
      .select(col("mean2"), col("mnn2"), col("c7"))
      .collect()
    // 02:00 window = (01: mx 8, 02: mx 32) → both means 20
    assert(out(0).getDouble(0) == 20.0 && out(0).getDouble(1) == 20.0)
    // 03:00 window = (02: mx 32, 03: null) → Mean (32+0)/2, NoNulls 32/1
    assert(out(1).getDouble(0) == 16.0 && out(1).getDouble(1) == 32.0)
    assert(out.forall(_.getDouble(2) == 7.5))

    def fail(averager: String): String = intercept[IllegalArgumentException] {
      run(s"""
        {"queryType": "movingAverage", "dataSource": "events",
         "granularity": "hour",
         "intervals": ["2024-03-01T02:00:00/2024-03-01T04:00:00"],
         "aggregations": [{"type": "count", "name": "c"}],
         "averagers": [$averager]}""")
    }.getMessage
    // unknown averagers are named in the rejection, with the supported set
    val m = fail("""{"type": "doubleSumCumulative", "name": "x",
                     "fieldName": "c", "buckets": 2}""")
    assert(m.contains("doubleSumCumulative") && m.contains("MeanNoNulls"))
    assert(fail("""{"type": "doubleMean", "name": "x", "fieldName": "c",
                    "buckets": 2, "cycleSize": 3}""").contains("cycleSize"))
    assert(fail("""{"type": "constant", "name": "x"}""").contains("value"))
    assert(fail("""{"type": "doubleMean", "name": "x", "buckets": 2}""")
      .contains("fieldName"))
  }

  test("review regressions: null-dim groups, filtered zero-fill, min stays null, subtotal shadowing") {
    // (1) movingAverage with a NULL dimension value: the null group keeps
    // its real aggregates (null-safe dim join), not zeros
    val withNullDim = Seq(
      (ts("2024-03-01 00:30:00"), null.asInstanceOf[String], 5.0),
      (ts("2024-03-01 01:30:00"), "click", 3.0))
      .toDF("__time", "event_type", "value")
    val ma = DruidQueryCompiler.compile("""
      {"queryType": "movingAverage", "dataSource": "t",
       "granularity": "hour",
       "intervals": ["2024-03-01T00:00:00/2024-03-01T02:00:00"],
       "dimensions": ["event_type"],
       "aggregations": [{"type": "doubleSum", "name": "sv", "fieldName": "value"}],
       "averagers": [{"type": "doubleMean", "name": "m2", "fieldName": "sv",
                      "buckets": 2}]}""", _ => withNullDim)
      .select(date_format(col("__time"), "HH:mm").as("h"),
        col("event_type"), col("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(ma.contains(("00:00", null, 5.0)), ma) // not zeroed
    assert(ma.contains(("01:00", "click", 3.0)), ma)

    // (2) dense timeseries: filtered-wrapped count zero-fills; min stays null
    val dense = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "hour",
       "intervals": ["2024-03-01T02:00:00/2024-03-01T04:00:00"],
       "context": {"skipEmptyBuckets": false},
       "aggregations": [
         {"type": "filtered", "name": "fcnt",
          "filter": {"dimension": "event_type", "value": "view"},
          "aggregator": {"type": "count", "name": "fcnt"}},
         {"type": "doubleMin", "name": "mn", "fieldName": "value"}]}""")
      .orderBy(col("__time"))
      .collect().map(r => (r.getLong(1), r.isNullAt(2)))
    // hour 02 has a view+buy; hour 03 empty: fcnt 0 (not null), mn null
    assert(dense.toSeq == Seq((1L, false), (0L, true)))

    // (3) subtotals: an extraction dim whose outputName shadows the metric
    // input must not corrupt the aggregation
    val shadow = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [
         {"type": "extraction", "dimension": "event_type",
          "outputName": "value",
          "extractionFn": {"type": "substring", "index": 0, "length": 1}}],
       "subtotalsSpec": [[], ["value"]],
       "aggregations": [{"type": "doubleSum", "name": "sv", "fieldName": "value"}]}""")
      .select(col("value"), col("sv"))
      .collect().map(r => Option(r.getString(0)).orNull -> r.getDouble(1)).toMap
    assert(shadow(null) == 63.0, shadow) // grand total sums the METRIC
    assert(shadow("c") == 13.0 && shadow("v") == 18.0 && shadow("b") == 32.0)
  }

  test("movingAverage with dimensions: per-dim dense frames and windows") {
    val out = run("""
      {"queryType": "movingAverage", "dataSource": "events",
       "granularity": "hour",
       "intervals": ["2024-03-01T01:00:00/2024-03-01T03:00:00"],
       "dimensions": ["event_type"],
       "aggregations": [{"type": "doubleSum", "name": "sv", "fieldName": "value"}],
       "averagers": [{"type": "doubleMean", "name": "ma2", "fieldName": "sv",
                      "buckets": 2}]}""")
      .orderBy(col("event_type"), col("__time"))
      .select(date_format(col("__time"), "HH:mm").as("h"),
        col("event_type"), col("sv"), col("ma2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
    // click: 00→1.0, 01→12.0, 02→0 (empty, zero-filled per-dim)
    // view:  00→2.0, 01→0,    02→16.0 ; buy: 02→32.0 (backward ext: 01→0)
    assert(out.toSeq == Seq(
      ("01:00", "buy", 0.0, 0.0),
      ("02:00", "buy", 32.0, 16.0),
      ("01:00", "click", 12.0, 6.5),
      ("02:00", "click", 0.0, 6.0),
      ("01:00", "view", 0.0, 1.0),
      ("02:00", "view", 16.0, 8.0)))
  }

  test("subtotalsSpec: grouping sets with nulled dims; bad dim rejected") {
    val out = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["event_type", "user"],
       "subtotalsSpec": [["event_type", "user"], ["user"], []],
       "aggregations": [{"type": "count", "name": "cnt"},
                        {"type": "doubleSum", "name": "sv", "fieldName": "value"}]}""")
      .select("event_type", "user", "cnt", "sv").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // full set: one row per (etype, user) pair present
    assert(out.contains(("click", "alice", 2L, 5.0)))
    // ["user"] subtotal: event_type nulled, aggregated over it
    assert(out.contains((null, "alice", 3L, 21.0)))
    assert(out.contains((null, "bob", 3L, 42.0)))
    // [] subtotal: grand total within the single `all` bucket
    assert(out.contains((null, null, 6L, 63.0)))
    // no rollup-style intermediate that wasn't asked for: ("click", null)
    // would come from a ["event_type"] set — absent here
    assert(!out.exists(r => r._1 == "click" && r._2 == null))

    assert(intercept[IllegalArgumentException] { run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["event_type"],
       "subtotalsSpec": [["nope"]],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
    }.getMessage.contains("subtotalsSpec"))
  }

  test("join dataSource: lookup right, INNER, broadcast plan; filter on prefixed col") {
    graft.queries.Lookups.register("jtypes",
      Map("click" -> "Click", "view" -> "View"))
    try {
      val df = run("""
        {"queryType": "groupBy",
         "dataSource": {"type": "join",
           "left": "events",
           "right": {"type": "lookup", "lookup": "jtypes"},
           "rightPrefix": "r.",
           "condition": "event_type == \"r.k\"",
           "joinType": "INNER"},
         "granularity": "all",
         "dimensions": [
           {"type": "default", "dimension": "r.v", "outputName": "label"}],
         "filter": {"type": "selector", "dimension": "r.v", "value": "Click"},
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "doubleSum", "name": "sv", "fieldName": "value"}]}""")
      // INNER drops "buy"; the prefixed-column filter keeps only Click
      val out = df.select("label", "cnt", "sv").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(out == Seq(("Click", 3L, 13.0)))
      // the right side rides a broadcast: fact side must not shuffle for it
      assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally graft.queries.Lookups.unregister("jtypes")
  }

  test("join dataSource: multi-equality condition; inline typing; rejections") {
    // conjunction of equalities + explicit columnTypes (value double)
    val multi = run("""
      {"queryType": "scan",
       "dataSource": {"type": "join",
         "left": "events",
         "right": {"type": "inline",
           "columnNames": ["t", "u", "bonus"],
           "columnTypes": ["string", "string", "double"],
           "rows": [["click", "alice", 0.5], ["view", "bob", 1.5]]},
         "rightPrefix": "j.",
         "condition": "event_type == \"j.t\" && user == \"j.u\"",
         "joinType": "INNER"},
       "columns": ["__time", "user", "j.bonus"]}""").collect()
    // click+alice matches 2 rows, view+bob 1 row
    assert(multi.length == 3)
    assert(multi.map(_.getDouble(2)).sorted.toSeq == Seq(0.5, 0.5, 1.5))

    // inline without columnTypes infers long vs double vs string
    val inferred = run("""
      {"queryType": "scan",
       "dataSource": {"type": "join",
         "left": "events",
         "right": {"type": "inline",
           "columnNames": ["t", "n", "d"],
           "rows": [["click", 7, 1.5]]},
         "rightPrefix": "j.",
         "condition": "event_type == \"j.t\"",
         "joinType": "INNER"},
       "columns": ["j.n", "j.d"]}""")
    assert(inferred.schema("j.n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(inferred.schema("j.d").dataType ==
      org.apache.spark.sql.types.DoubleType)

    def bad(json: String): String =
      intercept[IllegalArgumentException] { run(json) }.getMessage
    // a plain table right side is not global — Druid's rule
    assert(bad("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events", "right": "extra",
         "rightPrefix": "r.", "condition": "user == \"r.user\"",
         "joinType": "INNER"},
       "columns": ["__time"]}""").contains("global"))
    // rightPrefix colliding with a left column
    assert(bad("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events",
         "right": {"type": "inline", "columnNames": ["k"], "rows": [["x"]]},
         "rightPrefix": "event", "condition": "user == \"eventk\"",
         "joinType": "INNER"},
       "columns": ["__time"]}""").contains("collides"))
    // FULL is not a Druid join dataSource type
    assert(bad("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events",
         "right": {"type": "inline", "columnNames": ["k"], "rows": [["x"]]},
         "rightPrefix": "r.", "condition": "event_type == \"r.k\"",
         "joinType": "FULL"},
       "columns": ["__time"]}""").contains("INNER or LEFT"))
    // unknown column in the condition is loud
    assert(bad("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events",
         "right": {"type": "inline", "columnNames": ["k"], "rows": [["x"]]},
         "rightPrefix": "r.", "condition": "nope == \"r.k\"",
         "joinType": "INNER"},
       "columns": ["__time"]}""").contains("unknown column"))
    // a non-equality condition is loud, not silently cross-joined
    assert(bad("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events",
         "right": {"type": "inline", "columnNames": ["k"], "rows": [["x"]]},
         "rightPrefix": "r.", "condition": "event_type > \"r.k\"",
         "joinType": "INNER"},
       "columns": ["__time"]}""").contains("equality"))
    // a same-side equality (always true) would degenerate into a cross
    // join against the broadcast side — loud, like Druid
    assert(bad("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events",
         "right": {"type": "inline", "columnNames": ["k"], "rows": [["x"]]},
         "rightPrefix": "r.", "condition": "event_type == user",
         "joinType": "INNER"},
       "columns": ["__time"]}""").contains("cross join"))
    // fractional value into a long column: loud, never truncated — both
    // under explicit columnTypes and under inference (2 then 2.5 must
    // widen the whole column to double, not truncate row 2)
    assert(bad("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events",
         "right": {"type": "inline", "columnNames": ["t", "n"],
           "columnTypes": ["string", "long"],
           "rows": [["click", 2.5]]},
         "rightPrefix": "r.", "condition": "event_type == \"r.t\"",
         "joinType": "INNER"},
       "columns": ["__time"]}""").contains("not a long"))
    val widened = run("""
      {"queryType": "scan",
       "dataSource": {"type": "join", "left": "events",
         "right": {"type": "inline", "columnNames": ["t", "n"],
           "rows": [["click", 2], ["view", 2.5]]},
         "rightPrefix": "r.", "condition": "event_type == \"r.t\"",
         "joinType": "INNER"},
       "columns": ["r.n"]}""")
    assert(widened.schema("r.n").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(widened.collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(2.0, 2.0, 2.0, 2.5, 2.5)) // 3 clicks, 2 views
  }

  test("unnest dataSource: one row per element (no per-row dedup), " +
      "empty arrays skipped, unnestFilter prunes emitted rows") {
    // split('a,b,a') keeps duplicates — each contributes a row; the
    // 'buy' row's empty-string guard makes an empty array → skipped
    val rows = run("""
      {"queryType": "groupBy", "dataSource":
        {"type": "unnest", "base": "events",
         "virtualColumn": {"type": "expression", "name": "tag",
           "expression":
             "CASE WHEN event_type = 'buy' THEN array() WHEN event_type = 'click' THEN array(user, user) ELSE array(user) END"}},
       "granularity": "all", "dimensions": ["tag"],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select("tag", "cnt").collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // clicks (2 elems each): alice×2, bob×1; views (1 elem): alice, bob
    assert(rows == Map("alice" -> 5L, "bob" -> 3L))
    val filtered = run("""
      {"queryType": "groupBy", "dataSource":
        {"type": "unnest", "base": "events",
         "virtualColumn": {"type": "expression", "name": "tag",
           "expression": "array(user, event_type)"},
         "unnestFilter": {"type": "selector", "dimension": "tag",
           "value": "click"}},
       "granularity": "all", "dimensions": ["tag"],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select("tag", "cnt").collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(filtered == Map("click" -> 3L))
  }

  test("unnest dataSource rejection contract") {
    def bad(json: String): String =
      intercept[IllegalArgumentException](run(json)).getMessage
    val base = """"granularity": "all", "dimensions": ["tag"],
      "aggregations": [{"type": "count", "name": "cnt"}]"""
    assert(bad(s"""{"queryType": "groupBy", "dataSource":
        {"type": "unnest", "base": "events"}, $base}""")
      .contains("needs a virtualColumn"))
    assert(bad(s"""{"queryType": "groupBy", "dataSource":
        {"type": "unnest", "base": "events",
         "virtualColumn": {"type": "mv-filtered", "name": "tag",
           "expression": "array(user)"}}, $base}""")
      .contains("unnest virtualColumn type"))
    // output name colliding with a base column would silently shadow it
    assert(bad(s"""{"queryType": "groupBy", "dataSource":
        {"type": "unnest", "base": "events",
         "virtualColumn": {"type": "expression", "name": "user",
           "expression": "array(event_type)"}}, $base}""")
      .contains("collides"))
  }

  test("search sort spec: lexicographic, strlen and alphanumeric order the " +
      "hit list; unknown sorts rejected") {
    val base = """"queryType": "search", "dataSource": "events",
      "granularity": "all", "searchDimensions": ["event_type", "user"],
      "query": {"type": "insensitive_contains", "value": "b"}"""
    val lex = run(s"""{$base, "sort": {"type": "lexicographic"}}""")
      .collect().map(_.getAs[String]("value")).toSeq
    assert(lex == Seq("bob", "buy"))
    val sl = run(s"""{$base, "sort": {"type": "strlen"}}""")
      .collect().map(_.getAs[String]("value")).toSeq
    assert(sl == Seq("bob", "buy")) // same length → value tiebreak
    // alphanumeric runs now (r6 s2: the digit-run collation landed); no
    // digits here so it agrees with lexicographic
    val an = run(s"""{$base, "sort": {"type": "alphanumeric"}}""")
      .collect().map(_.getAs[String]("value")).toSeq
    assert(an == Seq("bob", "buy"))
    assert(intercept[IllegalArgumentException] {
      run(s"""{$base, "sort": {"type": "caseInsensitive"}}""").collect()
    }.getMessage.contains("dimension ordering"))
  }

  // ---------------------------------------------- sketch post-aggregators

  test("thetaSketchSetOp + thetaSketchEstimate post-aggs: set algebra over " +
      "filtered sketch aggregators (sparse-exact regime)") {
    // click users {alice,bob}, buy users {bob}:
    // intersect=1, not(click,buy)=1, union=2
    val r = run("""
      {"queryType": "timeseries", "dataSource": "events", "granularity": "all",
       "aggregations": [
         {"type": "filtered",
          "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
          "aggregator": {"type": "thetaSketch", "name": "click_u", "fieldName": "user"}},
         {"type": "filtered",
          "filter": {"type": "selector", "dimension": "event_type", "value": "buy"},
          "aggregator": {"type": "thetaSketch", "name": "buy_u", "fieldName": "user"}}],
       "postAggregations": [
         {"type": "thetaSketchEstimate", "name": "both",
          "field": {"type": "thetaSketchSetOp", "name": "i", "func": "INTERSECT",
            "fields": [{"type": "fieldAccess", "fieldName": "click_u"},
                       {"type": "fieldAccess", "fieldName": "buy_u"}]}},
         {"type": "thetaSketchEstimate", "name": "click_only",
          "field": {"type": "thetaSketchSetOp", "name": "n", "func": "NOT",
            "fields": [{"type": "fieldAccess", "fieldName": "click_u"},
                       {"type": "fieldAccess", "fieldName": "buy_u"}]}},
         {"type": "thetaSketchEstimate", "name": "either",
          "field": {"type": "thetaSketchSetOp", "name": "u", "func": "UNION",
            "fields": [{"type": "fieldAccess", "fieldName": "click_u"},
                       {"type": "fieldAccess", "fieldName": "buy_u"}]}}]}""")
      .collect().head
    assert(r.getAs[Double]("both") == 1.0)
    assert(r.getAs[Double]("click_only") == 1.0)
    assert(r.getAs[Double]("either") == 2.0)
    // response finalization: the sketch AGG columns themselves come back as
    // estimates (finalize=true default), not binaries
    assert(r.getAs[Double]("click_u") == 2.0)
    assert(r.getAs[Double]("buy_u") == 1.0)
  }

  test("finalizingFieldAccess reads finalized values inside arithmetic; " +
      "plain fieldAccess keeps raw partials for the finalizer post-aggs") {
    val r = run("""
      {"queryType": "timeseries", "dataSource": "events", "granularity": "all",
       "aggregations": [
         {"type": "thetaSketch", "name": "u", "fieldName": "user"},
         {"type": "doubleMean", "name": "mv", "fieldName": "value"},
         {"type": "count", "name": "cnt"}],
       "postAggregations": [
         {"type": "arithmetic", "name": "users_per_row", "fn": "/",
          "fields": [
            {"type": "finalizingFieldAccess", "fieldName": "u"},
            {"type": "fieldAccess", "fieldName": "cnt"}]},
         {"type": "arithmetic", "name": "mean_x2", "fn": "*",
          "fields": [
            {"type": "finalizingFieldAccess", "fieldName": "mv"},
            {"type": "constant", "name": "two", "value": 2}]}]}""")
      .collect().head
    assert(r.getAs[Double]("users_per_row") == 2.0 / 6.0)
    assert(math.abs(r.getAs[Double]("mean_x2") - 2 * 63.0 / 6) < 1e-12)
    assert(r.getAs[Double]("mv") == 63.0 / 6) // doubleMean finalized s/c
  }

  test("quantilesDoublesSketchToQuantile(s) post-aggs finalize a " +
      "histogramSketch aggregator (exact below bin capacity)") {
    val r = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [],
       "aggregations": [
         {"type": "quantilesDoublesSketch", "name": "vq", "fieldName": "value",
          "k": 64}],
       "postAggregations": [
         {"type": "quantilesDoublesSketchToQuantile", "name": "p50",
          "field": {"type": "fieldAccess", "fieldName": "vq"}, "fraction": 0.5},
         {"type": "quantilesDoublesSketchToQuantiles", "name": "pq",
          "field": {"type": "fieldAccess", "fieldName": "vq"},
          "fractions": [0.0, 1.0]}]}""")
      .collect().head
    // values 1,2,4,8,16,32 — rank ceil(0.5*6)=3 → 4.0
    assert(r.getAs[Double]("p50") == 4.0)
    assert(r.getAs[scala.collection.Seq[Double]]("pq").toSeq == Seq(1.0, 32.0))
  }

  test("doubleGreatest / longLeast post-aggs") {
    val r = run("""
      {"queryType": "timeseries", "dataSource": "events", "granularity": "all",
       "aggregations": [
         {"type": "doubleSum", "name": "sv", "fieldName": "value"},
         {"type": "count", "name": "cnt"}],
       "postAggregations": [
         {"type": "doubleGreatest", "name": "g",
          "fields": [{"type": "fieldAccess", "fieldName": "sv"},
                     {"type": "fieldAccess", "fieldName": "cnt"}]},
         {"type": "longLeast", "name": "l",
          "fields": [{"type": "fieldAccess", "fieldName": "sv"},
                     {"type": "fieldAccess", "fieldName": "cnt"}]}]}""")
      .collect().head
    assert(r.getAs[Double]("g") == 63.0)
    assert(r.getAs[Long]("l") == 6L)
  }

  test("hyperUniqueCardinality post-agg: estimate regardless of whether the " +
      "aggregator is the query-path estimate or the stored hllSketch binary") {
    val r = run("""
      {"queryType": "timeseries", "dataSource": "events", "granularity": "all",
       "aggregations": [
         {"type": "hyperUnique", "name": "hu", "fieldName": "user"},
         {"type": "hllSketch", "name": "hs", "fieldName": "user"}],
       "postAggregations": [
         {"type": "arithmetic", "name": "sum_est", "fn": "+",
          "fields": [{"type": "hyperUniqueCardinality", "fieldName": "hu"},
                     {"type": "hyperUniqueCardinality", "fieldName": "hs"}]}]}""")
      .collect().head
    // 2 distinct users, tiny cardinality → both estimates exact
    assert(r.getAs[Double]("sum_est") == 4.0)
    assert(r.getAs[Double]("hs") == 2.0) // hllSketch agg finalized to estimate
  }

  test("sketch post-agg rejection contract") {
    def bad(json: String): String =
      intercept[IllegalArgumentException](run(json)).getMessage
    val aggs = """"aggregations": [
      {"type": "thetaSketch", "name": "u", "fieldName": "user"}]"""
    assert(bad(s"""{"queryType": "timeseries", "dataSource": "events",
        "granularity": "all", $aggs, "postAggregations": [
          {"type": "thetaSketchSetOp", "name": "x", "func": "XOR",
           "fields": [{"type": "fieldAccess", "fieldName": "u"},
                      {"type": "fieldAccess", "fieldName": "u"}]}]}""")
      .contains("UNION/INTERSECT/NOT"))
    assert(bad(s"""{"queryType": "timeseries", "dataSource": "events",
        "granularity": "all", $aggs, "postAggregations": [
          {"type": "thetaSketchEstimate", "name": "x"}]}""")
      .contains("exactly one field"))
    assert(bad(s"""{"queryType": "timeseries", "dataSource": "events",
        "granularity": "all",
        "aggregations": [{"type": "quantilesDoublesSketch", "name": "q",
          "fieldName": "value"}],
        "postAggregations": [
          {"type": "finalizingFieldAccess", "name": "x", "fieldName": "q"}]}""")
      .contains("quantilesDoublesSketchToQuantile"))
  }

  test("granularity timeZone: zone-local day bucketing; unknown zone is " +
      "loud; zoned dense zero-fill emits zone-local empties") {
    // Tokyo (+09:00): all six 2024-03-01T00:10–02:45Z events land in the
    // LOCAL day that began 2024-02-29T15:00Z
    val r = run("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "P1D",
                        "timeZone": "Asia/Tokyo"},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(date_format(col("__time"), "yyyy-MM-dd HH:mm").as("b"), col("cnt"))
      .collect()
    assert(r.length == 1 && r(0).getString(0) == "2024-02-29 15:00" &&
      r(0).getLong(1) == 6L)
    def bad(json: String): String =
      intercept[IllegalArgumentException](run(json)).getMessage
    assert(bad("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "P1D",
                        "timeZone": "Not/AZone"},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .contains("unknown timeZone"))
    // zoned dense zero-fill (supported since r6): Tokyo wall hours map to
    // whole-hour instants (+09:00 fixed), the two trailing empty hours of
    // the interval come back zero-filled
    val dense = run("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "PT1H",
                        "timeZone": "Asia/Tokyo"},
        "intervals": ["2024-03-01T00:00:00/2024-03-01T05:00:00"],
        "context": {"skipEmptyBuckets": false},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .orderBy(col("__time"))
      .select(date_format(col("__time"), "HH:mm").as("b"), col("cnt"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(dense == Seq("00:00" -> 2L, "01:00" -> 2L, "02:00" -> 2L,
      "03:00" -> 0L, "04:00" -> 0L), dense)
  }

  test("granularity origin: instant-space anchored fixed-width buckets; " +
      "calendar+origin is loud; origin overrides the zone") {
    // PT30M anchored at 00:05 → buckets [00:05, 00:35), [00:35, 01:05)…
    val r = run("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "PT30M",
                        "origin": "2024-03-01T00:05:00"},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(date_format(col("__time"), "HH:mm").as("b"), col("cnt"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    // 00:10→00:05, 00:40→00:35, 01:10+01:20→01:05, 02:30→02:05, 02:45→02:35
    assert(r == Map("00:05" -> 1L, "00:35" -> 1L, "01:05" -> 2L,
      "02:05" -> 1L, "02:35" -> 1L))
    // explicit origin is tz-invariant: adding a zone changes nothing
    val r2 = run("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "PT30M",
                        "origin": "2024-03-01T00:05:00",
                        "timeZone": "Asia/Tokyo"},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(date_format(col("__time"), "HH:mm").as("b"), col("cnt"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r2 == r)
    def bad(json: String): String =
      intercept[IllegalArgumentException](run(json)).getMessage
    assert(bad("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "P1M",
                        "origin": "2024-03-01T00:05:00"},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .contains("fixed-width"))
    assert(bad("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "PT30M",
                        "origin": "not-a-time"},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .contains("unparseable origin"))
  }

  test("zoned dense zero-fill enumerates wall-clock buckets across the " +
      "DST spring-forward (23-hour day, gap hour collapses)") {
    val dst = Seq(
      (ts("2024-03-09 18:00:00"), "click", "alice", 1.0),
      (ts("2024-03-11 18:00:00"), "view", "bob", 2.0)
    ).toDF("__time", "event_type", "user", "value")
    // P1D in LA: three wall-day labels; Mar 10 is the 23-hour day (bucket
    // start stays 08:00Z, the NEXT start jumps to 07:00Z), empty → zeroed
    val out = DruidQueryCompiler.compile("""
      {"queryType": "timeseries", "dataSource": "d",
       "granularity": {"type": "period", "period": "P1D",
                       "timeZone": "America/Los_Angeles"},
       "intervals": ["2024-03-09T18:00:00/2024-03-12T00:00:00"],
       "aggregations": [{"type": "count", "name": "cnt"}]}""", _ => dst)
      .orderBy("__time")
      .select(date_format(col("__time"), "yyyy-MM-dd HH:mm:ss").as("b"),
        col("cnt"))
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-03-09 08:00:00", 1L),
      ("2024-03-10 08:00:00", 0L),
      ("2024-03-11 07:00:00", 1L)), out)

    // hourly frame across the 02:00 gap: the nonexistent wall hour resolves
    // to the same instant as 03:00 and collapses — 3 instant-hours emitted
    val gapBuckets = DruidQueryCompiler.compile("""
      {"queryType": "timeseries", "dataSource": "d",
       "granularity": {"type": "period", "period": "PT1H",
                       "timeZone": "America/Los_Angeles"},
       "intervals": ["2024-03-10T09:00:00/2024-03-10T12:00:00"],
       "context": {"skipEmptyBuckets": false},
       "aggregations": [{"type": "count", "name": "cnt"}]}""", _ => dst)
      .orderBy("__time")
      .select(date_format(col("__time"), "yyyy-MM-dd HH:mm").as("b"), col("cnt"))
      .as[(String, Long)].collect().toSeq
    assert(gapBuckets == Seq(
      ("2024-03-10 09:00", 0L),
      ("2024-03-10 10:00", 0L),
      ("2024-03-10 11:00", 0L)), gapBuckets)

    // zoned movingAverage: the trailing window steps back WALL days (the
    // Mar 10 bucket averages over [Mar 9, Mar 10] even though Mar 10 is 23
    // instant-hours) and empty buckets count as zero in the mean
    val ma = DruidQueryCompiler.compile("""
      {"queryType": "movingAverage", "dataSource": "d",
       "granularity": {"type": "period", "period": "P1D",
                       "timeZone": "America/Los_Angeles"},
       "intervals": ["2024-03-10T08:00:00/2024-03-12T07:00:00"],
       "aggregations": [{"type": "count", "name": "cnt"}],
       "averagers": [{"type": "longMean", "name": "avg_cnt",
                      "fieldName": "cnt", "buckets": 2}]}""", _ => dst)
      .orderBy("__time")
      .select(date_format(col("__time"), "yyyy-MM-dd HH:mm").as("b"),
        col("cnt"), col("avg_cnt"))
      .as[(String, Long, Double)].collect().toSeq
    assert(ma == Seq(
      ("2024-03-10 08:00", 0L, 0.5),   // (cnt Mar9=1 + 0) / 2
      ("2024-03-11 07:00", 1L, 0.5)),  // (0 + cnt Mar11=1) / 2
      ma)
  }

  test("timeseries envelope is time-ordered; descending:true reverses; " +
      "grandTotal row renders last either way") {
    def buckets(json: String): Seq[String] =
      run(json).select(date_format(col("__time"), "HH:mm")).collect()
        .map(_.getString(0)).toSeq
    val asc = buckets("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": "hour",
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
    assert(asc == Seq("00:00", "01:00", "02:00"), asc)
    val desc = buckets("""{"queryType": "timeseries", "dataSource": "events",
        "granularity": "hour", "descending": true,
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
    assert(desc == Seq("02:00", "01:00", "00:00"), desc)
    val withTotal = buckets("""{"queryType": "timeseries",
        "dataSource": "events", "granularity": "hour",
        "descending": true, "context": {"grandTotal": true},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
    assert(withTotal == Seq("02:00", "01:00", "00:00", null), withTotal)
    // top-level `limit` takes the first N buckets in envelope order
    val limited = buckets("""{"queryType": "timeseries",
        "dataSource": "events", "granularity": "hour",
        "descending": true, "limit": 2,
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
    assert(limited == Seq("02:00", "01:00"), limited)
    // limit + grandTotal: Druid appends the total AFTER limiting — N
    // buckets AND the null-stamped total, never N-1 buckets
    val limitedTotal = buckets("""{"queryType": "timeseries",
        "dataSource": "events", "granularity": "hour",
        "limit": 2, "context": {"grandTotal": true},
        "aggregations": [{"type": "count", "name": "cnt"}]}""")
    assert(limitedTotal == Seq("00:00", "01:00", null), limitedTotal)
  }

  test("alphanumeric collation: order-preserving key follows the Alphanum " +
      "algorithm (digit runs by length then digits)") {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column => asCol, expression => ex}
    val vals = Seq("a10", "a2", "x10y", "x9y", "b007", "b07", "b7",
      "u1", "u10", "u2")
    val sorted = vals.toDF("v")
      .orderBy(asCol(graft.functions.AlphanumericKey(ex(col("v")))))
      .collect().map(_.getString(0)).toSeq
    assert(sorted == Seq("a2", "a10", "b7", "b07", "b007",
      "u1", "u2", "u10", "x9y", "x10y"), sorted)
    // topN dimension ordering accepts the same names; unknown ones are loud
    val e = intercept[IllegalArgumentException](run("""
      {"queryType": "topN", "dataSource": "events", "granularity": "all",
       "dimension": "event_type", "threshold": 2,
       "metric": {"type": "dimension", "ordering": "caseInsensitive"},
       "aggregations": [{"type": "count", "name": "cnt"}]}""").collect())
    assert(e.getMessage.contains("dimension ordering"))
    // strlen ordering through the same path
    val strlen = run("""
      {"queryType": "topN", "dataSource": "events", "granularity": "all",
       "dimension": "event_type", "threshold": 2,
       "metric": {"type": "dimension", "ordering": "strlen"},
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select("event_type").collect().map(_.getString(0)).toSeq
    assert(strlen == Seq("buy", "view"), strlen) // 3 < 4 < 5 (click)
  }

  test("cascade/stringFormat/bucket extraction fns") {
    val rows = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [
         {"type": "extraction", "dimension": "event_type", "outputName": "tag",
          "extractionFn": {"type": "cascade", "extractionFns": [
            {"type": "substring", "index": 0, "length": 2},
            {"type": "upper"},
            {"type": "stringFormat", "format": "<%s>"}]}},
         {"type": "extraction", "dimension": "value", "outputName": "bkt",
          "extractionFn": {"type": "bucket", "size": 10.0, "offset": 2.0}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(col("tag"), col("bkt"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(_.toString)
    // values 1,4,8 → bucket [-8,2); 16 → [12,22); 32 → [22,32) wait: offset
    // 2, size 10 → buckets …[-8,2),[2,12),[12,22),[22,32),[32,42)
    assert(rows == Seq(("<BU>", "32.0", 1L), ("<CL>", "-8.0", 1L),
      ("<CL>", "2.0", 2L), ("<VI>", "2.0", 1L), ("<VI>", "12.0", 1L))
      .sortBy(_.toString), rows)
    // stringFormat nullHandling forms
    val nh = run("""
      {"queryType": "scan", "dataSource": "events",
       "virtualColumns": [{"type": "expression", "name": "nv",
         "expression": "nullif(event_type, 'click')"}],
       "columns": ["event_type", "nv"]}""")
    assert(nh.columns.contains("nv")) // virtual column plumbing sanity
    val nulls = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "virtualColumns": [{"type": "expression", "name": "nv",
         "expression": "nullif(event_type, 'click')"}],
       "dimensions": [{"type": "extraction", "dimension": "nv",
         "outputName": "s",
         "extractionFn": {"type": "stringFormat", "format": "[%s]"}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(col("s")).collect().map(_.getString(0)).toSet
    assert(nulls == Set("[null]", "[buy]", "[view]"), nulls)
  }

  test("partial/searchQuery/time extraction fns") {
    // partial: find()-retain (rlike) — "click" matches ^c, others null out
    val partial = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "event_type",
         "outputName": "k",
         "extractionFn": {"type": "partial", "expr": "^c"}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(col("k"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(partial == Map("click" -> 3L, (null: String) -> 3L), partial)
    // searchQuery: retain values the spec accepts — 'i' appears in
    // click/view but not buy
    val sq = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "event_type",
         "outputName": "k",
         "extractionFn": {"type": "searchQuery",
           "query": {"type": "insensitive_contains", "value": "I"}}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(col("k"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sq == Map("click" -> 3L, "view" -> 2L, (null: String) -> 1L), sq)
    // time: parse dd/MM/yyyy → render yyyy-MM-dd; the unparseable value
    // passes through UNCHANGED (upstream TimeDimExtractionFn fallback)
    val t = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "virtualColumns": [{"type": "expression", "name": "d",
         "expression": "case when user = 'alice' then '01/03/2024' else 'not a date' end"}],
       "dimensions": [{"type": "extraction", "dimension": "d",
         "outputName": "k",
         "extractionFn": {"type": "time", "timeFormat": "dd/MM/yyyy",
           "resultFormat": "yyyy-MM-dd"}}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(col("k"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(t == Map("2024-03-01" -> 3L, "not a date" -> 3L), t)
  }

  test("listFiltered/regexFiltered dimension specs: MV element filtering " +
      "before set-grouping") {
    def grouped(dimSpec: String): Seq[(Seq[String], Long)] = run(s"""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "virtualColumns": [{"type": "expression", "name": "tags",
         "expression": "array(event_type, user)"}],
       "dimensions": [$dimSpec],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(col("kept"), col("cnt"))
      .collect().map(r => (r.getSeq[String](0).toSeq, r.getLong(1)))
      .toSeq.sortBy(_.toString)
    // whitelist keeps only event-type elements → arrays collapse to them
    val white = grouped("""{"type": "listFiltered", "outputName": "kept",
      "delegate": {"type": "default", "dimension": "tags"},
      "values": ["click", "view", "buy"]}""")
    assert(white == Seq(Seq("buy") -> 1L, Seq("click") -> 3L,
      Seq("view") -> 2L).sortBy(_.toString), white)
    // blacklist drops them → arrays collapse to the user element
    val black = grouped("""{"type": "listFiltered", "outputName": "kept",
      "delegate": {"type": "default", "dimension": "tags"},
      "values": ["click", "view", "buy"], "isWhitelist": false}""")
    assert(black == Seq(Seq("alice") -> 3L, Seq("bob") -> 3L)
      .sortBy(_.toString), black)
    // regexFiltered is a FULL-string match (Druid's matches(), not a
    // substring find): "li" alone keeps nothing, "[a-z]*li[a-z]*" keeps
    // alice AND click
    val rexNone = grouped("""{"type": "regexFiltered", "outputName": "kept",
      "delegate": {"type": "default", "dimension": "tags"},
      "pattern": "li"}""")
    assert(rexNone == Seq(Seq[String]() -> 6L), rexNone)
    val rex = grouped("""{"type": "regexFiltered", "outputName": "kept",
      "delegate": {"type": "default", "dimension": "tags"},
      "pattern": "[a-z]*li[a-z]*"}""")
    // [click,alice]×2 keep both; [click,bob]→[click]; [view,alice]→[alice];
    // [view,bob]/[buy,bob]→[]
    assert(rex == Seq(Seq("click", "alice") -> 2L, Seq[String]() -> 2L,
      Seq("click") -> 1L, Seq("alice") -> 1L).sortBy(_.toString), rex)
    // a SINGLE-VALUE delegate follows Druid's SV rule: survive-or-null
    val sv = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "listFiltered", "outputName": "kept",
         "delegate": {"type": "default", "dimension": "event_type"},
         "values": ["click"]}],
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select(col("kept"), col("cnt"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
      .toSeq.sortBy(_.toString)
    assert(sv == Seq(Option.empty[String] -> 3L, Some("click") -> 3L)
      .sortBy(_.toString), sv)
    // explicit null isWhitelist = the DEFAULT whitelist, never blacklist
    val nullWl = grouped("""{"type": "listFiltered", "outputName": "kept",
      "delegate": {"type": "default", "dimension": "tags"},
      "values": ["click", "view", "buy"], "isWhitelist": null}""")
    assert(nullWl == white, nullWl)
    // missing knobs are loud
    assert(intercept[IllegalArgumentException](grouped(
      """{"type": "listFiltered",
          "delegate": {"type": "default", "dimension": "tags"}}"""))
      .getMessage.contains("values"))
  }

  test("scan orderBy: arbitrary-column sort specs; combining with the legacy " +
      "time order is loud") {
    val vals = run("""
      {"queryType": "scan", "dataSource": "events",
       "columns": ["event_type", "value"],
       "orderBy": [{"columnName": "event_type", "order": "ascending"},
                   {"columnName": "value", "order": "descending"}],
       "limit": 4}""")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(vals == Seq(("buy", 32.0), ("click", 8.0), ("click", 4.0),
      ("click", 1.0)), vals)
    assert(intercept[IllegalArgumentException](run("""
      {"queryType": "scan", "dataSource": "events",
       "order": "ascending",
       "orderBy": [{"columnName": "value", "order": "ascending"}]}""").collect())
      .getMessage.contains("not both"))
    assert(intercept[IllegalArgumentException](run("""
      {"queryType": "scan", "dataSource": "events",
       "orderBy": [{"columnName": "value", "order": "sideways"}]}""").collect())
      .getMessage.contains("sideways"))
  }

  test("topN previousStop: resumes after the value in the spec's collation, " +
      "below it when inverted") {
    def dims(metric: String): Seq[String] = run(s"""
      {"queryType": "topN", "dataSource": "events", "granularity": "all",
       "dimension": "event_type", "threshold": 10, "metric": $metric,
       "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .select("event_type").collect().map(_.getString(0)).toSeq
    assert(dims("""{"type": "dimension", "previousStop": "buy"}""") ==
      Seq("click", "view"))
    assert(dims("""{"type": "inverted", "metric":
        {"type": "dimension", "previousStop": "view"}}""") ==
      Seq("click", "buy"))
    // no previousStop → full list, unchanged
    assert(dims("""{"type": "dimension"}""") == Seq("buy", "click", "view"))
  }

  test("KLL quantile sketch spellings alias the quantiles family " +
      "(aggregator + every post-agg)") {
    def q(aggType: String, paPrefix: String): Seq[org.apache.spark.sql.Row] =
      run(s"""{"queryType": "timeseries", "dataSource": "events",
          "granularity": "all",
          "aggregations": [{"type": "$aggType", "name": "vq",
                            "fieldName": "value", "k": 4096}],
          "postAggregations": [
            {"type": "${paPrefix}ToQuantile", "name": "p50",
             "field": {"type": "fieldAccess", "fieldName": "vq"},
             "fraction": 0.5},
            {"type": "${paPrefix}ToRank", "name": "r8",
             "field": {"type": "fieldAccess", "fieldName": "vq"},
             "value": 8.0},
            {"type": "${paPrefix}ToCDF", "name": "cdf",
             "field": {"type": "fieldAccess", "fieldName": "vq"},
             "splitPoints": [4.0]},
            {"type": "${paPrefix}ToHistogram", "name": "hist",
             "field": {"type": "fieldAccess", "fieldName": "vq"},
             "splitPoints": [4.0]}]}""")
        .select(col("p50"), col("r8"),
          element_at(col("cdf"), 1), element_at(col("hist"), 2))
        .collect().toSeq
    val kll = q("KllDoublesSketch", "KllDoublesSketch")
    val qds = q("quantilesDoublesSketch", "quantilesDoublesSketch")
    assert(kll == qds, s"KLL alias diverged: $kll vs $qds")
    // exact regime sanity: p50 of {1,2,4,8,16,32} (lower rank) = 4,
    // inclusive rank of 8 = 4/6
    assert(kll.head.getDouble(0) == 4.0 && kll.head.getDouble(1) == 4.0 / 6)
  }

  test("native-surface semantics pinned by review r7: date-only intervals, " +
      "search contains default, explicit-null extraction values, " +
      "empty regex captures") {
    // date-only ISO interval endpoints (Druid's most common spelling)
    val dd = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "all", "intervals": ["2024-03-01/2024-03-02"],
       "aggregations": [{"type": "count", "name": "n"}]}""")
      .select(col("n")).as[Long].head()
    assert(dd == 6L, dd)
    // search `contains` without caseSensitive is INSENSITIVE (upstream's
    // primitive-boolean default; matches the fragment branch + filter path)
    val sc = run("""
      {"queryType": "search", "dataSource": "events",
       "granularity": "all", "searchDimensions": ["event_type"],
       "query": {"type": "contains", "value": "CLICK"}}""")
      .select(col("value")).as[String].collect().toSet
    assert(sc == Set("click"), sc)
    // explicit JSON null under an extraction selector is a NULL match,
    // never the 4-char string "null": lookup leaves 'buy' unmapped → null
    val nl = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": ["event_type"],
       "filter": {"type": "selector", "dimension": "event_type", "value": null,
         "extractionFn": {"type": "lookup", "lookup": {"type": "map",
           "map": {"click": "c", "view": "v"}}}},
       "aggregations": [{"type": "count", "name": "n"}]}""")
      .select(col("event_type"), col("n")).as[(String, Long)].collect().toSet
    assert(nl == Set(("buy", 1L)), nl)
    // a regex that MATCHES with an empty capture emits the empty capture,
    // not the miss fallback (raw input)
    val re = run("""
      {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
       "dimensions": [{"type": "extraction", "dimension": "event_type",
         "outputName": "k",
         "extractionFn": {"type": "regex", "expr": "^click(.*)$"}}],
       "aggregations": [{"type": "count", "name": "n"}]}""")
      .select(col("k"), col("n")).as[(String, Long)].collect().toMap
    assert(re.get("") == Some(3L), re) // 'click' matched, capture empty
    assert(re.get("click") == None, re)
  }

  test("aggregator inputs read the RAW row, not the granularity bucket") {
    // longMax over __time under hour buckets: Druid evaluates aggregator
    // inputs against the raw row, so each bucket's max is its latest EVENT
    // time, never the bucket start (review finding r7 — the filter half of
    // this rule was already pinned by the fuzz suite)
    val rows = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "hour",
       "aggregations": [{"type": "longMax", "name": "last_ms",
                         "fieldName": "__time"}]}""")
      .select(col("__time"), col("last_ms")).collect()
      .map(r => r.getTimestamp(0).toInstant.toString -> r.getLong(1)).toMap
    def ms(t: String): Long = ts(t).getTime
    assert(rows("2024-03-01T00:00:00Z") == ms("2024-03-01 00:40:00"), rows)
    assert(rows("2024-03-01T01:00:00Z") == ms("2024-03-01 01:20:00"), rows)
    assert(rows("2024-03-01T02:00:00Z") == ms("2024-03-01 02:45:00"), rows)
    // same rule through a filtered wrapper delegate
    val f = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "hour",
       "aggregations": [{"type": "filtered", "name": "last_click",
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "click"},
         "aggregator": {"type": "longMax", "name": "last_click",
                        "fieldName": "__time"}}]}""")
      .select(col("__time"), col("last_click")).collect()
      .map(r => r.getTimestamp(0).toInstant.toString ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(f("2024-03-01T01:00:00Z") == Some(ms("2024-03-01 01:20:00")), f)
    assert(f("2024-03-01T02:00:00Z") == None, f) // no clicks that hour
  }

  test("expression filters in filtered aggs reject only REAL __time reads") {
    // the literal text '__time' inside a string constant is data, not a
    // column reference — must compile (review finding r7: the old check
    // was a raw substring match)
    val ok = run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "hour",
       "aggregations": [{"type": "filtered", "name": "n",
         "filter": {"type": "expression",
                    "expression": "event_type != '__time'"},
         "aggregator": {"type": "count", "name": "n"}}]}""")
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(ok == 6L, s"expected all 6 rows, got $ok")
    // an expression that actually READS __time still fails loud
    val e = intercept[Exception] { run("""
      {"queryType": "timeseries", "dataSource": "events",
       "granularity": "hour",
       "aggregations": [{"type": "filtered", "name": "n",
         "filter": {"type": "expression", "expression": "__time > 0"},
         "aggregator": {"type": "count", "name": "n"}}]}""").collect() }
    assert(e.getMessage.contains("__time"), e.getMessage)
  }
}
