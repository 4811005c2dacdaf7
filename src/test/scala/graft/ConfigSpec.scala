package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.time.Granularity

/** SpecLoader parsing + validate() collision semantics
  * (upstream DruidRollupTest analog — SURVEY §5).
  */
class ConfigSpec extends AnyFunSuite {

  private val fullJson =
    """{"dataSchema": {
         "dataSource": "wiki",
         "parser": {"parseSpec": {
           "timestampSpec": {"column": "t", "format": "posix", "missingValue": "2024-01-01"},
           "dimensionsSpec": {"dimensions": ["page", "user"],
             "spatialDimensions": [{"dimName": "coord", "dims": ["lat", "lon"]}]}}},
         "metricsSpec": [
           {"type": "count", "name": "cnt"},
           {"type": "doubleSum", "name": "added", "fieldName": "delta"},
           {"type": "filtered", "name": "bot_edits",
            "filter": {"dimension": "user", "value": "bot"},
            "aggregator": {"type": "count", "name": "bot_edits"}}],
         "granularitySpec": {"segmentGranularity": "SIX_HOUR",
                             "queryGranularity": "FIVE_MINUTE", "rollup": true}},
        "tuning": {"windowPeriod": "PT30M", "partitions": 3, "replicants": 2,
                   "maxBatchSize": 500, "dedupKeys": ["page", "user"]}}"""

  test("parses the full Druid-style ingestion spec") {
    val spec = SpecLoader.fromJson(fullJson)
    assert(spec.dataSchema.dataSource == "wiki")
    assert(spec.dataSchema.timestampSpec == TimestampSpec("t", "posix", Some("2024-01-01")))
    spec.dataSchema.dimensionsSpec match {
      case sd: SpecificDimensions =>
        assert(sd.dimensions == Seq("page", "user"))
        assert(sd.spatialDimensions ==
          Seq(SpatialDimension("coord", Seq("lat", "lon"))))
      case other => fail(s"wrong dims: $other")
    }
    assert(spec.dataSchema.aggregators.map(_.aggType) == Seq("count", "doubleSum", "filtered"))
    val filtered = spec.dataSchema.aggregators.last
    assert(filtered.filterSpec.contains(SelectorFilter("user", "bot")))
    assert(filtered.aggregator.get.aggType == "count")
    assert(spec.dataSchema.granularitySpec ==
      GranularitySpec(Granularity.SixHour, Granularity.FiveMinute, rollup = true))
    assert(spec.tuning.windowPeriod == java.time.Duration.ofMinutes(30))
    assert(spec.tuning.partitions == 3)
    assert(spec.tuning.maxBatchSize == 500)
    assert(spec.tuning.dedupKeys == Seq("page", "user"))
  }

  test("ingest metricsSpec rejects extractionFn filtered metrics at LOAD; " +
      "query-path parseAgg keeps the raw JSON") {
    val bad =
      """{"dataSchema": {"dataSource": "t",
           "parser": {"parseSpec": {
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["user"]}}},
           "metricsSpec": [
             {"type": "filtered", "name": "m",
              "filter": {"type": "selector", "dimension": "user", "value": "B",
                "extractionFn": {"type": "upper"}},
              "aggregator": {"type": "count", "name": "m"}}]}}"""
    val e = intercept[IllegalArgumentException](SpecLoader.fromJson(bad))
    assert(e.getMessage.contains("extractionFn"))
    assert(e.getMessage.contains("transformSpec"))
    // the same aggregator parsed standalone (the query path) carries the
    // raw JSON for DruidQueryCompiler.filterColumn, not a parsed FilterSpec
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(
      """{"type": "filtered", "name": "m",
          "filter": {"type": "selector", "dimension": "user", "value": "B",
            "extractionFn": {"type": "upper"}},
          "aggregator": {"type": "count", "name": "m"}}""")
    val spec = SpecLoader.parseAgg(node)
    assert(spec.filterSpec.isEmpty && spec.filterJson.isDefined)
  }

  test("parses transformSpec: derived columns + nested filter DSL") {
    val spec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "t",
           "parser": {"parseSpec": {
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["up"]}}},
           "transformSpec": {
             "transforms": [{"name": "up", "expression": "upper(raw)"}],
             "filter": {"type": "and", "fields": [
               {"type": "in", "dimension": "lang", "values": ["en", "de"]},
               {"type": "not", "field":
                 {"type": "selector", "dimension": "src", "value": "spam"}}]}},
           "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    assert(spec.dataSchema.transformSpec.transforms ==
      Seq(TransformField("up", "upper(raw)")))
    assert(spec.dataSchema.transformSpec.filter.contains(
      AndFilter(Seq(InFilter("lang", Seq("en", "de")),
        NotFilter(SelectorFilter("src", "spam"))))))
    // unknown filter type names the supported set
    val e = intercept[IllegalArgumentException] {
      SpecLoader.fromJson(
        """{"dataSchema": {"dataSource": "t",
             "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
               "dimensionsSpec": {"dimensions": ["d"]}}},
             "transformSpec": {"filter": {"type": "javascript", "dimension": "d"}},
             "metricsSpec": []}}""")
    }
    assert(e.getMessage.contains("javascript") && e.getMessage.contains("selector"))

    // regex / like parse (and a non-compiling regex fails at load)
    val rl = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "t",
           "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["d"]}}},
           "transformSpec": {"filter": {"type": "and", "fields": [
             {"type": "regex", "dimension": "d", "pattern": "^c.*k$"},
             {"type": "like", "dimension": "d", "pattern": "c%k"}]}},
           "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    assert(rl.dataSchema.transformSpec.filter.contains(AndFilter(Seq(
      RegexFilter("d", "^c.*k$"), LikeFilter("d", "c%k")))))
    assert(intercept[IllegalArgumentException] {
      SpecLoader.fromJson(
        """{"dataSchema": {"dataSource": "t",
             "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
               "dimensionsSpec": {"dimensions": ["d"]}}},
             "transformSpec": {"filter": {"type": "regex", "dimension": "d",
               "pattern": "[unclosed"}},
             "metricsSpec": []}}""")
    }.getMessage.contains("does not compile"))
  }

  test("bound filter JSON: strict ends + ordering parse; malformed specs fail at LOAD") {
    def load(filter: String) = SpecLoader.fromJson(
      s"""{"dataSchema": {"dataSource": "t",
            "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
              "dimensionsSpec": {"dimensions": ["d"]}}},
            "transformSpec": {"filter": $filter},
            "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    val b = load("""{"type": "bound", "dimension": "d", "lower": "5",
                     "upper": "10", "lowerStrict": true, "upperStrict": false,
                     "ordering": "numeric"}""")
      .dataSchema.transformSpec.filter.get
    assert(b == BoundFilter("d", Some("5"), Some("10"),
      lowerStrict = true, upperStrict = false, ordering = "numeric"))
    // all four malformed shapes fail at spec load, not first query:
    assert(intercept[IllegalArgumentException] {
      load("""{"type": "bound", "dimension": "d", "ordering": "alphanumeric"}""")
    }.getMessage.contains("alphanumeric"))
    assert(intercept[IllegalArgumentException] {
      load("""{"type": "bound", "dimension": "d", "lower": "abc",
               "ordering": "numeric"}""")
    }.getMessage.contains("abc"))
    assert(intercept[IllegalArgumentException] {
      load("""{"type": "and"}""")
    }.getMessage.contains("non-empty"))
    assert(intercept[IllegalArgumentException] {
      SpecLoader.fromJson(
        """{"dataSchema": {"dataSource": "t",
             "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
               "dimensionsSpec": {"dimensions": ["d"]}}},
             "transformSpec": {"transforms": [{"name": "x"}]},
             "metricsSpec": []}}""")
    }.getMessage.contains("expression"))
  }

  test("modern dataSchema layout: top-level timestampSpec/dimensionsSpec parse " +
      "(and win over a legacy parser.parseSpec)") {
    val modern = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "wiki",
           "timestampSpec": {"column": "t", "format": "posix"},
           "dimensionsSpec": {"dimensions": ["page", "user"]},
           "metricsSpec": [{"type": "count", "name": "cnt"}],
           "granularitySpec": {"segmentGranularity": "HOUR",
                               "queryGranularity": "MINUTE"}}}""")
    assert(modern.dataSchema.timestampSpec ==
      TimestampSpec("t", "posix", scala.None))
    assert(modern.dataSchema.dimensionsSpec ==
      SpecificDimensions(Seq("page", "user")))
    // both layouts present: top-level wins (Druid's parser deprecation)
    val both = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "wiki",
           "timestampSpec": {"column": "t_new"},
           "dimensionsSpec": {"dimensions": ["d_new"]},
           "parser": {"parseSpec": {
             "timestampSpec": {"column": "t_old"},
             "dimensionsSpec": {"dimensions": ["d_old"]}}},
           "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    assert(both.dataSchema.timestampSpec.column == "t_new")
    assert(both.dataSchema.dimensionsSpec ==
      SpecificDimensions(Seq("d_new")))
  }

  test("typed filters (equality/range/null): typed compare, open ends, null semantics, rejections") {
    val spark = SparkSpec.session
    import spark.implicits._
    def parse(json: String) = SpecLoader.parseFilter(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
    def ids(rows: org.apache.spark.sql.DataFrame,
        f: graft.config.FilterSpec): Set[String] =
      rows.filter(graft.pipeline.Filters.toColumn(f))
        .select("id").as[String].collect().toSet

    val rows = Seq(
      ("a", "apple", java.lang.Double.valueOf(2.0)),
      ("b", "2", java.lang.Double.valueOf(2.7)),
      ("c", "banana", java.lang.Double.valueOf(10.0)),
      ("d", null, java.lang.Double.valueOf(-1.0)),
      ("e", "apple", null: java.lang.Double)
    ).toDF("id", "s", "v")

    // equality STRING: string compare; null column never matches, not() does
    val eqS = parse("""{"type": "equality", "column": "s",
      "matchValueType": "STRING", "matchValue": "apple"}""")
    assert(eqS == EqualityFilter("s", "STRING", "apple"))
    assert(ids(rows, eqS) == Set("a", "e"))
    assert(ids(rows, NotFilter(eqS)) == Set("b", "c", "d"))

    // equality LONG against a DOUBLE column: numeric compare without
    // truncation — 2.0 matches matchValue 2, 2.7 must NOT
    val eqL = parse("""{"type": "equality", "column": "v",
      "matchValueType": "LONG", "matchValue": 2}""")
    assert(ids(rows, eqL) == Set("a"))
    // equality DOUBLE over a STRING column: unparseable values never match
    val eqD = parse("""{"type": "equality", "column": "s",
      "matchValueType": "DOUBLE", "matchValue": 2.0}""")
    assert(ids(rows, eqD) == Set("b"))
    assert(ids(rows, NotFilter(eqD)) == Set("a", "c", "d", "e"))

    // range DOUBLE with an open lower end; range STRING is lexicographic
    val rgD = parse("""{"type": "range", "column": "v",
      "matchValueType": "DOUBLE", "lower": 2.0, "lowerOpen": true,
      "upper": 10.0}""")
    assert(rgD == TypedRangeFilter("v", "DOUBLE", Some("2.0"), Some("10.0"),
      lowerOpen = true, upperOpen = false))
    assert(ids(rows, rgD) == Set("b", "c"))
    val rgS = parse("""{"type": "range", "column": "s",
      "matchValueType": "STRING", "lower": "apple", "upper": "banana",
      "upperOpen": true}""")
    assert(ids(rows, rgS) == Set("a", "e"))

    // LONG compares exactly past 2^53 (a double compare would collide)
    val bigRows = Seq(
      ("p", java.lang.Long.valueOf(9007199254740993L)),
      ("q", java.lang.Long.valueOf(9007199254740992L))
    ).toDF("id", "n")
    val eqBig = parse("""{"type": "equality", "column": "n",
      "matchValueType": "LONG", "matchValue": 9007199254740993}""")
    assert(bigRows.filter(graft.pipeline.Filters.toColumn(eqBig))
      .select("id").as[String].collect().toSeq == Seq("p"))
    // values past the decimal comparison range keep the double verdict —
    // a LONG range must not silently drop a 1e30 row
    val hugeRows = Seq(("h", java.lang.Double.valueOf(1e30)),
      ("l", java.lang.Double.valueOf(-5.0))).toDF("id", "x")
    val rgHuge = parse("""{"type": "range", "column": "x",
      "matchValueType": "LONG", "lower": 0}""")
    assert(hugeRows.filter(graft.pipeline.Filters.toColumn(rgHuge))
      .select("id").as[String].collect().toSeq == Seq("h"))
    // and a tiny non-zero double must not round-match LONG 0
    val tinyRows = Seq(("t", java.lang.Double.valueOf(1e-16)),
      ("z", java.lang.Double.valueOf(0.0))).toDF("id", "x")
    val eqZero = parse("""{"type": "equality", "column": "x",
      "matchValueType": "LONG", "matchValue": 0}""")
    assert(tinyRows.filter(graft.pipeline.Filters.toColumn(eqZero))
      .select("id").as[String].collect().toSeq == Seq("z"))

    // null filter MATCHES nulls (the one filter that does); not() excludes
    val nl = parse("""{"type": "null", "column": "s"}""")
    assert(nl == NullFilter("s"))
    assert(ids(rows, nl) == Set("d"))
    assert(ids(rows, NotFilter(nl)) == Set("a", "b", "c", "e"))

    // projection bookkeeping knows the new types
    assert(graft.pipeline.Filters.dimensions(eqL) == Seq("v"))
    assert(graft.pipeline.Filters.dimensions(rgD) == Seq("v"))
    assert(graft.pipeline.Filters.dimensions(nl) == Seq("s"))

    // malformed shapes fail at parse, with pointers
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "equality", "column": "s",
               "matchValueType": "STRING"}""")
    }.getMessage.contains("matchValue"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "equality", "column": "s",
               "matchValueType": "STRING", "matchValue": null}""")
    }.getMessage.contains("null filter"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "equality", "column": "s",
               "matchValueType": "ARRAY<STRING>", "matchValue": ["x"]}""")
    }.getMessage.contains("matchValueType"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "equality", "column": "v",
               "matchValueType": "LONG", "matchValue": "abc"}""")
    }.getMessage.contains("not numeric"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "range", "column": "v",
               "matchValueType": "DOUBLE"}""")
    }.getMessage.contains("lower/upper"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "range", "column": "v",
               "matchValueType": "LONG", "lower": "abc"}""")
    }.getMessage.contains("not numeric"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "null"}""")
    }.getMessage.contains("column"))
  }

  test("spatial filter: inclusive rectangle, radius, null/malformed coords, rejections") {
    val spark = SparkSpec.session
    import spark.implicits._
    def parse(json: String) = SpecLoader.parseFilter(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
    val rows = Seq(
      ("a", "10.0,-50.0"),  // on the min corner — inclusive
      ("b", "60.0,25.0"),   // on the max corner — inclusive
      ("c", "35.0,0.0"),    // interior
      ("d", "61.0,0.0"),    // lat out
      ("e", "35.0,-51.0"),  // lon out
      ("f", null),          // null dim
      ("g", "35.0"),        // malformed: missing lon
      ("h", "x,y")          // malformed: non-numeric
    ).toDF("id", "coord")

    val rect = parse("""{"type": "spatial", "dimension": "coord",
      "bound": {"type": "rectangular",
                "minCoords": [10.0, -50.0], "maxCoords": [60.0, 25.0]}}""")
    assert(rect == SpatialRectFilter("coord", Seq(10.0, -50.0), Seq(60.0, 25.0)))
    val in = rows.filter(graft.pipeline.Filters.toColumn(rect))
      .select("id").as[String].collect().toSet
    assert(in == Set("a", "b", "c"))
    // never-NULL contract: not(spatial) MATCHES null/malformed rows
    val out = rows.filter(graft.pipeline.Filters.toColumn(
      graft.config.NotFilter(rect))).select("id").as[String].collect().toSet
    assert(out == Set("d", "e", "f", "g", "h"))

    // projection keeps the spatial dim (filtered-agg path): dimensions()
    // must know the spatial types, not MatchError on them
    assert(graft.pipeline.Filters.dimensions(rect) == Seq("coord"))
    assert(graft.pipeline.Filters.dimensions(
      graft.config.NotFilter(rect)) == Seq("coord"))

    val radius = parse("""{"type": "spatial", "dimension": "coord",
      "bound": {"type": "radius", "coords": [35.0, 0.0], "radius": 5.0}}""")
    val near = rows.filter(graft.pipeline.Filters.toColumn(radius))
      .select("id").as[String].collect().toSet
    assert(near == Set("c")) // only the exact center row is within 5

    // polygon bound: triangle lat∈[20,50]-ish around the interior point —
    // ray casting keeps "c" (35, 0), drops the corners and out-of-range rows
    val poly = parse("""{"type": "spatial", "dimension": "coord",
      "bound": {"type": "polygon",
                "abscissa": [20.0, 50.0, 35.0],
                "ordinate": [-10.0, -5.0, 20.0]}}""")
    assert(poly == graft.config.SpatialPolygonFilter("coord",
      Seq(20.0, 50.0, 35.0), Seq(-10.0, -5.0, 20.0)))
    val inPoly = rows.filter(graft.pipeline.Filters.toColumn(poly))
      .select("id").as[String].collect().toSet
    assert(inPoly == Set("c"))
    // never-NULL contract holds for polygon too
    val outPoly = rows.filter(graft.pipeline.Filters.toColumn(
      graft.config.NotFilter(poly))).select("id").as[String].collect().toSet
    assert(outPoly == Set("a", "b", "d", "e", "f", "g", "h"))
    assert(graft.pipeline.Filters.dimensions(poly) == Seq("coord"))
    // degenerate polygons rejected loudly
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "spatial", "dimension": "coord",
        "bound": {"type": "polygon", "abscissa": [1.0, 2.0], "ordinate": [1.0, 2.0]}}""")
    }.getMessage.contains("3 vertices"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "spatial", "dimension": "coord",
        "bound": {"type": "rectangular", "minCoords": [1.0],
                  "maxCoords": [2.0, 3.0]}}""")
    }.getMessage.contains("equal-length"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "spatial", "dimension": "coord",
        "bound": {"type": "rectangular", "minCoords": [5.0],
                  "maxCoords": [2.0]}}""")
    }.getMessage.contains("exceeds"))
    // a non-numeric coordinate in the SPEC fails at load (asDouble would
    // silently coerce "10.O" → 0.0: a wrong filter box, not an error)
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "spatial", "dimension": "coord",
        "bound": {"type": "rectangular", "minCoords": ["10.O", -50.0],
                  "maxCoords": [60.0, 25.0]}}""")
    }.getMessage.contains("non-numeric"))
  }

  test("search/columnComparison/expression/true/false filters: parse + Druid null semantics") {
    val spark = SparkSpec.session
    import spark.implicits._
    def parse(json: String) = SpecLoader.fromJson(
      s"""{"dataSchema": {"dataSource": "t",
            "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
              "dimensionsSpec": {"dimensions": ["d"]}}},
            "transformSpec": {"filter": $json},
            "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
      .dataSchema.transformSpec.filter.get
    val df = Seq(("Alpha", Option("Alpha")), ("beta", Option("ALPHA")),
      (null, Option.empty[String]))
      .toDF("a", "b")

    // search: insensitive by default, null never matches, not() matches null
    val ins = parse("""{"type": "search", "dimension": "a",
                        "query": {"type": "contains", "value": "ALPH"}}""")
    assert(ins == SearchFilter("a", "ALPH"))
    assert(df.filter(graft.pipeline.Filters.toColumn(ins)).count() == 1)
    val cs = SearchFilter("a", "alph", caseSensitive = true)
    assert(df.filter(graft.pipeline.Filters.toColumn(cs)).count() == 0)
    assert(df.filter(graft.pipeline.Filters.toColumn(NotFilter(ins))).count() == 2)

    // columnComparison: null == null MATCHES (Druid), a==b row matches
    val cc = parse("""{"type": "columnComparison", "dimensions": ["a", "b"]}""")
    assert(df.filter(graft.pipeline.Filters.toColumn(cc)).count() == 2)

    // expression filter: Spark SQL dialect; null expr value → no match,
    // not() complement matches it
    val ef = parse("""{"type": "expression", "expression": "length(a) > 4"}""")
    assert(df.filter(graft.pipeline.Filters.toColumn(ef)).count() == 1)
    assert(df.filter(graft.pipeline.Filters.toColumn(NotFilter(ef))).count() == 2)
    assert(graft.pipeline.Filters.dimensions(ef) == Seq("a"))

    // true/false constants
    assert(df.filter(graft.pipeline.Filters.toColumn(parse("""{"type": "true"}"""))).count() == 3)
    assert(df.filter(graft.pipeline.Filters.toColumn(parse("""{"type": "false"}"""))).count() == 0)

    // rejections at LOAD
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "search", "dimension": "a",
               "query": {"type": "fragment", "values": ["x"]}}""")
    }.getMessage.contains("contains"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "columnComparison", "dimensions": ["a"]}""")
    }.getMessage.contains(">= 2"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"type": "expression"}""")
    }.getMessage.contains("expression"))
  }

  test("interval filter + cardinality fields + expression postAgg parse rules") {
    def load(metrics: String, filter: String = "null") = SpecLoader.fromJson(
      s"""{"dataSchema": {"dataSource": "t",
            "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
              "dimensionsSpec": {"dimensions": ["d"]}}},
            ${if (filter != "null") s""""transformSpec": {"filter": $filter},""" else ""}
            "metricsSpec": $metrics}}""")
    // interval filter: parses, endpoints validated at LOAD
    val iv = load("""[{"type": "count", "name": "cnt"}]""",
      """{"type": "interval", "dimension": "__time",
          "intervals": ["2024-01-01T00:00:00/2024-01-02T00:00:00"]}""")
      .dataSchema.transformSpec.filter.get
    assert(iv == IntervalFilter("__time",
      Seq("2024-01-01T00:00:00/2024-01-02T00:00:00")))
    assert(intercept[IllegalArgumentException] {
      load("""[{"type": "count", "name": "cnt"}]""",
        """{"type": "interval", "intervals": ["yesterday/today"]}""")
    }.getMessage.contains("ISO-8601"))
    assert(intercept[IllegalArgumentException] {
      load("""[{"type": "count", "name": "cnt"}]""",
        """{"type": "interval", "intervals": []}""")
    }.getMessage.contains("non-empty"))
    // cardinality fields: byRow=true required for tuples
    val card = load("""[{"type": "exactCardinality", "name": "u",
      "fields": ["a", "b"], "byRow": true}]""").dataSchema.aggregators.head
    assert(card.fields == Seq("a", "b"))
    assert(intercept[IllegalArgumentException] {
      load("""[{"type": "cardinality", "name": "u", "fields": ["a", "b"]}]""")
    }.getMessage.contains("byRow"))
    // expression postAgg round-trips
    val pa = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "e",
           "parser": {"parseSpec": {"timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["d"]}}},
           "metricsSpec": [{"type": "count", "name": "cnt"}],
           "postAggregations": [{"type": "expression", "name": "x",
             "expression": "cnt * 2"}]}}""").dataSchema.postAggregations.head
    assert(pa.paType == "expression" && pa.expression.contains("cnt * 2"))
  }

  test("loader parses approxHistogram accuracy and hllSketch") {
    val spec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "e",
           "parser": {"parseSpec": {
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["d"]}}},
           "metricsSpec": [
             {"type": "approxHistogram", "name": "h", "fieldName": "v",
              "probabilities": [0.5, 0.9], "accuracy": 123456},
             {"type": "hllSketch", "name": "u", "fieldName": "x"}]}}""")
    val aggs = spec.dataSchema.aggregators
    assert(aggs(0).accuracy.contains(123456))
    assert(aggs(0).probabilities == Seq(0.5, 0.9))
    assert(aggs(1).aggType == "hllSketch" && aggs(1).accuracy.isEmpty)
  }

  test("DataSketches extension aliases normalize at parse (k → accuracy)") {
    val spec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "e",
           "parser": {"parseSpec": {
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["d"]}}},
           "metricsSpec": [
             {"type": "quantilesDoublesSketch", "name": "q", "fieldName": "v",
              "k": 128, "probabilities": [0.5]},
             {"type": "HLLSketchBuild", "name": "u", "fieldName": "x"},
             {"type": "filtered", "name": "qf",
              "filter": {"dimension": "d", "value": "a"},
              "aggregator": {"type": "quantilesDoublesSketch", "name": "qd",
                             "fieldName": "v", "k": 64}}]}}""")
    val aggs = spec.dataSchema.aggregators
    assert(aggs(0).aggType == "histogramSketch" && aggs(0).accuracy.contains(128))
    assert(aggs(1).aggType == "hllSketch")
    // alias normalizes inside a filtered wrapper too (merge routing keys
    // off the delegate's canonical aggType)
    assert(aggs(2).aggregator.exists(_.aggType == "histogramSketch"))
    assert(aggs(2).aggregator.flatMap(_.accuracy).contains(64))
  }

  test("loader parses nested postAggregations (arithmetic/fieldAccess/constant)") {
    val spec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "e",
           "parser": {"parseSpec": {
             "timestampSpec": {"column": "ts"},
             "dimensionsSpec": {"dimensions": ["d"]}}},
           "metricsSpec": [{"type": "count", "name": "cnt"},
                           {"type": "doubleSum", "name": "sv", "fieldName": "v"}],
           "postAggregations": [
             {"type": "arithmetic", "name": "avg", "fn": "/",
              "fields": [{"type": "fieldAccess", "fieldName": "sv"},
                         {"type": "arithmetic", "name": "n2", "fn": "*",
                          "fields": [{"type": "fieldAccess", "fieldName": "cnt"},
                                     {"type": "constant", "name": "two", "value": 2.0}]}]}]}}""")
    val pa = spec.dataSchema.postAggregations
    assert(pa.size == 1 && pa.head.name == "avg" && pa.head.fn == "/")
    assert(pa.head.fields.map(_.paType) == Seq("fieldAccess", "arithmetic"))
    assert(pa.head.fields(1).fields(1).value.contains(2.0))
    // unknown fn fails at column-build time with a named error
    val bad = graft.config.PostAggregatorSpec("arithmetic", "x", fn = "^",
      fields = Seq(graft.config.PostAggregatorSpec("constant", "c", value = Some(1.0))))
    val err = intercept[IllegalArgumentException] {
      graft.pipeline.Aggregators.postAggColumn(bad)
    }
    assert(err.getMessage.contains("^"))
  }

  test("empty dimensions array means schemaless") {
    val spec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "x",
           "parser": {"parseSpec": {"dimensionsSpec":
             {"dimensions": [], "dimensionExclusions": ["secret"]}}}}}""")
    spec.dataSchema.dimensionsSpec match {
      case SchemalessDimensions(excl, _) => assert(excl == Seq("secret"))
      case other => fail(s"expected schemaless: $other")
    }
  }

  test("validate rejects dimension/metric name collisions (DruidRollup#validate)") {
    val bad = IngestionSpec(DataSchema("x", TimestampSpec("ts"),
      SpecificDimensions(Seq("foo")),
      Seq(AggregatorSpec("count", "foo"))))
    intercept[IllegalArgumentException](bad.validate())
  }

  test("validate rejects timestamp-column collision") {
    val bad = IngestionSpec(DataSchema("x", TimestampSpec("ts"),
      SpecificDimensions(Seq("ts")), Nil))
    intercept[IllegalArgumentException](bad.validate())
  }

  test("validate rejects exclusion/metric clash in schemaless mode") {
    val bad = IngestionSpec(DataSchema("x", TimestampSpec("ts"),
      SchemalessDimensions(Seq("cnt")),
      Seq(AggregatorSpec("count", "cnt"))))
    intercept[IllegalArgumentException](bad.validate())
  }

  test("validate rejects engine-reserved column names (segment/__ts/" +
      "__graft_raw_ts/__batch_id would be silently clobbered)") {
    val badDim = IngestionSpec(DataSchema("x", TimestampSpec("ts"),
      SpecificDimensions(Seq("segment")), Nil))
    val e = intercept[IllegalArgumentException](badDim.validate())
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val badAgg = IngestionSpec(DataSchema("x", TimestampSpec("ts"),
      SpecificDimensions(Seq("foo")),
      Seq(AggregatorSpec("count", "__batch_id"))))
    intercept[IllegalArgumentException](badAgg.validate())
  }

  test("interval endpoints accept date-only ISO spellings (Druid's most " +
      "common form)") {
    val (lo, hi) = graft.time.Intervals.parse("2020-01-01/2020-01-02")
    assert(lo == java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli)
    assert(hi - lo == 86400000L)
  }

  test("object-form dimension entries: multiValueHandling + typed dims parse; " +
      "bad values are loud at projection") {
    val spec = SpecLoader.fromJson(
      """{"dataSchema": {"dataSource": "d",
           "parser": {"parseSpec": {
             "timestampSpec": {"column": "ts", "format": "auto"},
             "dimensionsSpec": {"dimensions": [
               "plain",
               {"name": "tags", "multiValueHandling": "sorted_set"},
               {"name": "uid", "type": "LONG"}]}}},
           "metricsSpec": [{"type": "count", "name": "cnt"}]}}""")
    val sd = spec.dataSchema.dimensionsSpec
      .asInstanceOf[graft.config.SpecificDimensions]
    assert(sd.dimensions == Seq("plain", "tags", "uid"))
    assert(sd.multiValueHandling == Map("tags" -> "SORTED_SET")) // case-normalized
    assert(sd.dimTypes == Map("uid" -> "long"))
    // nameless object entry rejected at LOAD
    assert(intercept[IllegalArgumentException] {
      SpecLoader.fromJson(
        """{"dataSchema": {"dataSource": "d",
             "parser": {"parseSpec": {
               "timestampSpec": {"column": "ts", "format": "auto"},
               "dimensionsSpec": {"dimensions": [{"type": "string"}]}}},
             "metricsSpec": []}}""")
    }.getMessage.contains("name"))
  }

  test("defaults mirror the reference (ClusteredBeamTuning/Tranquilizer)") {
    val t = Tuning()
    assert(t.windowPeriod == java.time.Duration.ofMinutes(10))
    assert(t.partitions == 1 && t.replicants == 1)
    assert(t.maxBatchSize == 2000 && t.maxPendingBatches == 5 && t.lingerMillis == 0L)
    assert(GranularitySpec().segmentGranularity == Granularity.Hour)
  }
}
