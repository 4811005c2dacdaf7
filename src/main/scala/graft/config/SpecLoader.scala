package graft.config

import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.time.Granularity

/** Parses the Druid-ingestion-spec-shaped JSON config the reference accepts
  * (upstream: druid/DruidBeams.scala#fromConfig +
  * config/DataSourceConfig.scala; SURVEY §1.2). Hand-rolled tree walk over
  * Jackson so unknown/extra keys are tolerated exactly like the reference's
  * lenient config parsing.
  *
  * Accepted shape (all sections optional except dataSource):
  * {{{
  * { "dataSchema": {
  *     "dataSource": "foo",
  *     "parser": { "parseSpec": {
  *       "timestampSpec": {"column": "ts", "format": "auto"},
  *       "dimensionsSpec": {"dimensions": ["d1"],
  *                          "dimensionExclusions": [],
  *                          "spatialDimensions": [{"dimName":"coord","dims":["lat","lon"]}] } } },
  *     "metricsSpec": [ {"type":"count","name":"cnt"},
  *                      {"type":"doubleSum","name":"v","fieldName":"value"} ],
  *     "granularitySpec": {"segmentGranularity":"HOUR","queryGranularity":"MINUTE","rollup":true} },
  *   "tuning": {"windowPeriod":"PT10M","partitions":2,"maxBatchSize":2000} }
  * }}}
  */
object SpecLoader {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): IngestionSpec = fromNode(mapper.readTree(json))

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n).flatMap(x => Option(x.get(field)))

  private def str(n: JsonNode, field: String, default: String): String =
    opt(n, field).map(_.asText).getOrElse(default)

  private def fromNode(root: JsonNode): IngestionSpec = {
    val ds = opt(root, "dataSchema").getOrElse(
      throw new IllegalArgumentException("missing dataSchema"))
    val dataSource = str(ds, "dataSource", "")
    require(dataSource.nonEmpty, "dataSchema.dataSource is required")

    // two accepted layouts: the LEGACY parser.parseSpec nesting (what
    // tranquility-era specs carry) and the MODERN top-level
    // dataSchema.timestampSpec / dataSchema.dimensionsSpec (what every
    // index_parallel / streaming-supervisor spec since Druid 0.17 uses).
    // Top-level wins when both appear, matching Druid's parser deprecation.
    val parseSpec = opt(ds, "parser").flatMap(opt(_, "parseSpec"))

    val tsSpec = opt(ds, "timestampSpec")
      .orElse(parseSpec.flatMap(opt(_, "timestampSpec"))).map { t =>
      TimestampSpec(
        column = str(t, "column", "timestamp"),
        format = str(t, "format", "auto"),
        missingValue = opt(t, "missingValue").map(_.asText))
    }.getOrElse(TimestampSpec())

    val dimSpec: DimensionsSpec = opt(ds, "dimensionsSpec")
      .orElse(parseSpec.flatMap(opt(_, "dimensionsSpec"))).map { d =>
      val spatial = opt(d, "spatialDimensions").toSeq
        .flatMap(_.elements.asScala)
        .map { s =>
          val dims = opt(s, "dims").toSeq.flatMap(_.elements.asScala).map(_.asText)
          val nm = str(s, "dimName", "")
          SpatialDimension(nm, if (dims.nonEmpty) dims else Seq(nm))
        }
      opt(d, "dimensions").filter(x => x.isArray && x.size > 0) match {
        case Some(dims) =>
          // entries are plain strings or Druid DimensionSchema objects:
          // {"name": …, "type": string|long|float|double,
          //  "multiValueHandling": SORTED_ARRAY|SORTED_SET|ARRAY}
          val entries = dims.elements.asScala.toSeq.map { e =>
            if (e.isTextual) (e.asText, scala.None, scala.None)
            else {
              val nm = str(e, "name", "")
              require(nm.nonEmpty, s"dimension entry needs a name: $e")
              (nm,
                opt(e, "type").map(_.asText.toLowerCase(java.util.Locale.ROOT)),
                opt(e, "multiValueHandling")
                  .map(_.asText.toUpperCase(java.util.Locale.ROOT)))
            }
          }
          SpecificDimensions(entries.map(_._1), spatial,
            multiValueHandling = entries.collect {
              case (n, _, Some(h)) => n -> h }.toMap,
            dimTypes = entries.collect {
              case (n, Some(t), _) if t != "string" => n -> t }.toMap)
        case scala.None =>
          val excl = opt(d, "dimensionExclusions").toSeq
            .flatMap(_.elements.asScala).map(_.asText)
          SchemalessDimensions(excl, spatial)
      }
    }.getOrElse(SchemalessDimensions())

    val metrics = opt(ds, "metricsSpec").toSeq
      .flatMap(_.elements.asScala).map(parseAgg)
    // extraction filters stay a query-path feature: an ingest-time filtered
    // metric silently comparing the RAW dimension would be wrong data, and
    // the extraction compiler lives on the query side — refuse at LOAD
    def noExtraction(a: AggregatorSpec): Unit = {
      require(a.filterJson.isEmpty,
        s"filtered metric '${a.name}': extractionFn filters are not " +
          "supported in ingest metricsSpec (apply the extraction in " +
          "transformSpec and filter the derived column instead)")
      a.aggregator.foreach(noExtraction)
    }
    metrics.foreach(noExtraction)

    val postAggs = opt(ds, "postAggregations").toSeq
      .flatMap(_.elements.asScala).map(parsePostAgg)

    val gran = opt(ds, "granularitySpec").map { g =>
      GranularitySpec(
        segmentGranularity = Granularity.fromString(str(g, "segmentGranularity", "HOUR")),
        queryGranularity = Granularity.fromString(str(g, "queryGranularity", "NONE")),
        rollup = opt(g, "rollup").forall(_.asBoolean))
    }.getOrElse(GranularitySpec())

    val tuning = opt(root, "tuning").map { t =>
      Tuning(
        windowPeriod = Duration.parse(str(t, "windowPeriod", "PT10M")),
        partitions = opt(t, "partitions").map(_.asInt).getOrElse(1),
        replicants = opt(t, "replicants").map(_.asInt).getOrElse(1),
        maxBatchSize = opt(t, "maxBatchSize").map(_.asInt).getOrElse(2000),
        maxPendingBatches = opt(t, "maxPendingBatches").map(_.asInt).getOrElse(5),
        lingerMillis = opt(t, "lingerMillis").map(_.asLong).getOrElse(0L),
        warmingPeriod = Duration.parse(str(t, "warmingPeriod", "PT0M")),
        dedupKeys = opt(t, "dedupKeys").toSeq
          .flatMap(_.elements.asScala).map(_.asText))
    }.getOrElse(Tuning())

    val transformSpec = opt(ds, "transformSpec").map { t =>
      TransformSpec(
        transforms = opt(t, "transforms").toSeq
          .flatMap(_.elements.asScala)
          .map { n =>
            val tf = TransformField(str(n, "name", ""), str(n, "expression", ""))
            require(tf.name.nonEmpty && tf.expression.nonEmpty,
              s"transform needs name and expression, got $n")
            tf
          },
        filter = opt(t, "filter").map(parseFilter))
    }.getOrElse(TransformSpec())

    val parser = parseSpec.map { p =>
      val format = str(p, "format", "json") match {
        case "tsv" => "delimited" // tsv is delimited with a tab default
        case f     => f
      }
      require(Seq("json", "csv", "delimited", "regex").contains(format),
        s"unsupported parseSpec format '$format' (json/csv/tsv/delimited/regex)")
      val pattern = opt(p, "pattern").map(_.asText)
      if (format == "regex") {
        val pat = pattern.getOrElse(throw new IllegalArgumentException(
          "regex parseSpec needs a pattern"))
        require(scala.util.Try(java.util.regex.Pattern.compile(pat)).isSuccess,
          s"regex parseSpec pattern does not compile: '$pat'")
      }
      val flatten = opt(p, "flattenSpec").toSeq
        .flatMap(f => opt(f, "fields").toSeq.flatMap(_.elements.asScala))
        .map { f =>
          val name = str(f, "name", "")
          require(name.nonEmpty, "flattenSpec field needs a name")
          str(f, "type", "path") match {
            case "path" => FlattenField(name,
              opt(f, "expr").map(_.asText).getOrElse(
                throw new IllegalArgumentException(
                  s"flattenSpec path field '$name' needs an expr")))
            case "root" => FlattenField(name, s"$$.$name")
            case "jq" => throw new IllegalArgumentException(
              "flattenSpec type 'jq' is not supported — rewrite the jq " +
                "expression as a JSONPath 'path' field")
            case other => throw new IllegalArgumentException(
              s"unsupported flattenSpec field type '$other' (path/root)")
          }
        }
      if (flatten.nonEmpty) require(format == "json",
        "flattenSpec applies to the json format only")
      ParserSpec(
        format = format,
        columns = opt(p, "columns").toSeq.flatMap(_.elements.asScala).map(_.asText),
        // upstream defaults: csv splits on comma; tsv AND "delimited"
        // default to TAB (Druid's DelimitedParseSpec default — a verbatim
        // delimited spec without a delimiter must not silently null out)
        delimiter = str(p, "delimiter",
          if (str(p, "format", "json") == "csv") "," else "\t"),
        pattern = pattern,
        flatten = flatten)
    }.getOrElse(ParserSpec())

    IngestionSpec(
      DataSchema(dataSource, tsSpec, dimSpec, metrics, gran, postAggs,
        transformSpec, parser), tuning).validate()
  }

  /** Druid filter DSL subset: selector / in / and / or / not / bound.
    * Malformed filters fail HERE, where every other spec error surfaces —
    * not at first query time. */
  /** Whether any node of a filter tree carries an extractionFn (those
    * compile only on the query path — [[parseAgg]] keeps the raw JSON). */
  private[graft] def hasExtractionFn(n: JsonNode): Boolean =
    opt(n, "extractionFn").isDefined ||
      opt(n, "fields").exists(_.elements.asScala.exists(hasExtractionFn)) ||
      opt(n, "field").exists(hasExtractionFn)

  private[graft] def parseFilter(n: JsonNode): FilterSpec = {
    // extraction-bearing filters only exist on the query path, where
    // DruidQueryCompiler.filterColumn compiles them BEFORE reaching here;
    // anywhere else (ingest transformSpec, filtered aggregators) silently
    // comparing the RAW dimension would be wrong data — refuse loudly
    require(opt(n, "extractionFn").isEmpty,
      s"extractionFn is not supported in '${str(n, "type", "")}' filters " +
        "here (query-clause filters support it; ingest/filtered-aggregator " +
        "filters do not)")
    parseFilterInner(n)
  }

  private def parseFilterInner(n: JsonNode): FilterSpec = str(n, "type", "") match {
    case "selector" => SelectorFilter(str(n, "dimension", ""), str(n, "value", ""))
    case "in" => InFilter(str(n, "dimension", ""),
      opt(n, "values").toSeq.flatMap(_.elements.asScala).map(_.asText))
    case "and" =>
      val fs = opt(n, "fields").toSeq.flatMap(_.elements.asScala).map(parseFilter)
      require(fs.nonEmpty, "and filter needs a non-empty fields array")
      AndFilter(fs)
    case "or" =>
      val fs = opt(n, "fields").toSeq.flatMap(_.elements.asScala).map(parseFilter)
      require(fs.nonEmpty, "or filter needs a non-empty fields array")
      OrFilter(fs)
    case "not" => NotFilter(parseFilter(opt(n, "field").getOrElse(
      throw new IllegalArgumentException("not filter needs a field"))))
    case "regex" =>
      val p = str(n, "pattern", "")
      require(scala.util.Try(java.util.regex.Pattern.compile(p)).isSuccess,
        s"regex filter pattern does not compile: '$p'")
      RegexFilter(str(n, "dimension", ""), p)
    case "like" => LikeFilter(str(n, "dimension", ""), str(n, "pattern", ""))
    case "interval" =>
      val ivs = opt(n, "intervals").toSeq.flatMap(_.elements.asScala)
        .map(_.asText)
      require(ivs.nonEmpty, "interval filter needs a non-empty intervals array")
      ivs.foreach(graft.time.Intervals.parse) // malformed endpoints fail at LOAD
      IntervalFilter(str(n, "dimension", "__time"), ivs)
    case "search" =>
      val q = opt(n, "query").getOrElse(throw new IllegalArgumentException(
        "search filter needs a query object"))
      require(str(q, "type", "contains") == "contains",
        "search filter supports query.type=contains " +
          "(insensitive_contains = contains with caseSensitive=false)")
      SearchFilter(str(n, "dimension", ""), str(q, "value", ""),
        caseSensitive = opt(q, "caseSensitive").exists(_.asBoolean))
    case "columnComparison" =>
      val ds = opt(n, "dimensions").toSeq.flatMap(_.elements.asScala)
        .map(_.asText)
      require(ds.size >= 2, "columnComparison filter needs >= 2 dimensions")
      ColumnComparisonFilter(ds)
    case "expression" =>
      val e = str(n, "expression", "")
      require(e.nonEmpty, "expression filter needs an expression")
      ExpressionFilter(e)
    case "true"  => TrueFilter()
    case "false" => FalseFilter()
    case "spatial" =>
      val d = str(n, "dimension", "")
      require(d.nonEmpty, "spatial filter needs a dimension")
      val bound = opt(n, "bound").getOrElse(
        throw new IllegalArgumentException("spatial filter needs a bound"))
      def coords(field: String): Seq[Double] =
        opt(bound, field).toSeq.flatMap(_.elements.asScala).map { e =>
          // asDouble would coerce a typo'd string to 0.0 — a silently
          // wrong filter box; malformed specs fail at LOAD like the rest
          require(e.isNumber, s"spatial bound $field has a non-numeric " +
            s"coordinate: $e")
          e.asDouble
        }
      str(bound, "type", "") match {
        case "rectangular" =>
          val (lo, hi) = (coords("minCoords"), coords("maxCoords"))
          require(lo.nonEmpty && lo.size == hi.size,
            "rectangular bound needs equal-length non-empty minCoords/maxCoords")
          lo.zip(hi).foreach { case (l, h) => require(l <= h,
            s"rectangular bound minCoord $l exceeds maxCoord $h") }
          SpatialRectFilter(d, lo, hi)
        case "radius" =>
          val c = coords("coords")
          val r = opt(bound, "radius").map(_.asDouble).getOrElse(
            throw new IllegalArgumentException("radius bound needs a radius"))
          require(c.nonEmpty, "radius bound needs coords")
          require(r >= 0, s"radius must be non-negative, got $r")
          SpatialRadiusFilter(d, c, r)
        case "polygon" =>
          val (xs, ys) = (coords("abscissa"), coords("ordinate"))
          require(xs.size == ys.size && xs.size >= 3,
            "polygon bound needs equal-length abscissa/ordinate with >= 3 vertices")
          SpatialPolygonFilter(d, xs, ys)
        case other => throw new IllegalArgumentException(
          s"unsupported spatial bound type '$other' (rectangular/radius/polygon)")
      }
    case "bound" =>
      val ordering = str(n, "ordering", "lexicographic")
      require(ordering == "lexicographic" || ordering == "numeric",
        s"bound filter ordering '$ordering' (supported: lexicographic/numeric)")
      val lower = opt(n, "lower").map(_.asText)
      val upper = opt(n, "upper").map(_.asText)
      if (ordering == "numeric") (lower ++ upper).foreach { v =>
        require(scala.util.Try(v.toDouble).isSuccess,
          s"bound filter numeric ordering needs numeric bounds, got '$v'")
      }
      BoundFilter(
        dimension = str(n, "dimension", ""),
        lower = lower,
        upper = upper,
        lowerStrict = opt(n, "lowerStrict").exists(_.asBoolean),
        upperStrict = opt(n, "upperStrict").exists(_.asBoolean),
        ordering = ordering)
    // -- Druid 26+ typed filters (the SQL planner's defaults when
    // sqlUseBoundAndSelectors=false). These take `column`, not `dimension`.
    case "null" =>
      val c = str(n, "column", "")
      require(c.nonEmpty, "null filter needs a column")
      NullFilter(c)
    case "equality" =>
      val c = str(n, "column", "")
      require(c.nonEmpty, "equality filter needs a column")
      val t = str(n, "matchValueType", "").toUpperCase
      require(Set("STRING", "LONG", "FLOAT", "DOUBLE").contains(t),
        s"equality filter matchValueType '$t' " +
          "(supported: STRING/LONG/FLOAT/DOUBLE; for null matching use " +
          "the null filter — Druid rejects a null matchValue too)")
      val v = opt(n, "matchValue").filterNot(_.isNull).getOrElse(
        throw new IllegalArgumentException(
          "equality filter needs a non-null matchValue (use the null " +
            "filter for IS NULL)"))
      if (t != "STRING") require(v.isNumber ||
          scala.util.Try(v.asText.toDouble).isSuccess,
        s"equality filter matchValue '${v.asText}' is not numeric " +
          s"under matchValueType $t")
      EqualityFilter(c, t, v.asText)
    case "range" =>
      val c = str(n, "column", "")
      require(c.nonEmpty, "range filter needs a column")
      val t = str(n, "matchValueType", "").toUpperCase
      require(Set("STRING", "LONG", "FLOAT", "DOUBLE").contains(t),
        s"range filter matchValueType '$t' " +
          "(supported: STRING/LONG/FLOAT/DOUBLE)")
      val lower = opt(n, "lower").filterNot(_.isNull).map(_.asText)
      val upper = opt(n, "upper").filterNot(_.isNull).map(_.asText)
      require(lower.isDefined || upper.isDefined,
        "range filter needs at least one of lower/upper")
      if (t != "STRING") (lower ++ upper).foreach { v =>
        require(scala.util.Try(v.toDouble).isSuccess,
          s"range filter bound '$v' is not numeric under matchValueType $t")
      }
      TypedRangeFilter(c, t, lower, upper,
        lowerOpen = opt(n, "lowerOpen").exists(_.asBoolean),
        upperOpen = opt(n, "upperOpen").exists(_.asBoolean))
    case other => throw new IllegalArgumentException(
      s"unsupported filter type '$other' " +
        "(supported: selector/in/and/or/not/regex/like/bound/interval/" +
        "equality/range/null/…)")
  }

  /** Druid postAggregations shape: {"type":"arithmetic","name":"avg","fn":"/",
    * "fields":[{"type":"fieldAccess","fieldName":"sum_v"},
    *           {"type":"fieldAccess","fieldName":"cnt"}]}
    */
  private[graft] def parsePostAgg(n: JsonNode): PostAggregatorSpec =
    PostAggregatorSpec(
      paType = str(n, "type", ""),
      name = str(n, "name", ""),
      fn = str(n, "fn", ""),
      // sketch-finalizer post-aggs (thetaSketchEstimate,
      // quantilesDoublesSketchToQuantile(s), HLLSketchEstimate) take a
      // SINGULAR `field` sub-post-agg in Druid; normalize it into `fields`
      fields = opt(n, "fields").toSeq.flatMap(_.elements.asScala).map(parsePostAgg) ++
        opt(n, "field").map(parsePostAgg),
      fieldName = opt(n, "fieldName").map(_.asText),
      value = opt(n, "value").map(_.asDouble),
      expression = opt(n, "expression").map(_.asText),
      // `func` is thetaSketchSetOp's op key; arrayOfDoublesSketchSetOp
      // spells the same thing `operation`
      func = if (opt(n, "func").isDefined) str(n, "func", "")
             else str(n, "operation", ""),
      fraction = opt(n, "fraction").map(_.asDouble),
      fractions = opt(n, "fractions").toSeq
        .flatMap(_.elements.asScala).map(_.asDouble),
      splitPoints = opt(n, "splitPoints").toSeq
        .flatMap(_.elements.asScala).map(_.asDouble))

  /** Druid DataSketches-extension type names → canonical engine aggTypes.
    * `quantilesDoublesSketch` keeps the extension's contract (mergeable
    * quantile partials re-merged at read) on the engine's centroid-histogram
    * binary — documented algorithm delta (Ben-Haim/Tom-Toby vs upstream
    * KLL), same API shape including the `k` size knob.
    */
  private val aggTypeAliases = Map(
    "quantilesDoublesSketch" -> "histogramSketch",
    // datasketches-kll: same quantile-sketch contract (mergeable partials,
    // `k` size knob, identical post-agg family) on the engine's
    // centroid-histogram binary — the same documented algorithm delta as
    // quantilesDoublesSketch (KLL vs Ben-Haim/Tom-Toby)
    "KllDoublesSketch" -> "histogramSketch",
    "KllFloatsSketch" -> "histogramSketch",
    "HLLSketchBuild" -> "hllSketch")

  private[graft] def parseAgg(n: JsonNode): AggregatorSpec = {
    val t = aggTypeAliases.getOrElse(str(n, "type", ""), str(n, "type", ""))
    if (t == "filtered") {
      val f = opt(n, "filter").getOrElse(
        throw new IllegalArgumentException("filtered aggregator needs a filter"))
      val delegate = parseAgg(opt(n, "aggregator").getOrElse(
        throw new IllegalArgumentException("filtered aggregator needs a delegate")))
      AggregatorSpec(
        aggType = "filtered",
        name = str(n, "name", delegate.name),
        // the full filter DSL — same language as transformSpec.filter /
        // the query filter clause (Druid allows any filter here); a
        // type-less {"dimension","value"} object is the selector shorthand.
        // Extraction-bearing trees keep the RAW JSON: only the query
        // compiler can compile extractionFns (Druid allows them here too);
        // the ingest path rejects filterJson at spec LOAD below.
        filterSpec =
          if (hasExtractionFn(f)) scala.None
          else Some(
            if (opt(f, "type").isEmpty)
              SelectorFilter(str(f, "dimension", ""), str(f, "value", ""))
            else parseFilter(f)),
        filterJson = if (hasExtractionFn(f)) Some(f) else scala.None,
        aggregator = Some(delegate))
    } else {
      // arrayOfDoublesSketch reuses `fields` for its metricColumns (the
      // summed per-key doubles); cardinality-family `fields` is the byRow
      // dimension tuple
      val fields = opt(n, "fields").toSeq
        .flatMap(_.elements.asScala).map(_.asText) ++
        opt(n, "metricColumns").toSeq.flatMap(_.elements.asScala).map(_.asText)
      if (fields.size > 1 && t != "arrayOfDoublesSketch")
        require(opt(n, "byRow").exists(_.asBoolean),
          s"cardinality '$t' over multiple fields supports byRow=true only " +
            "(tuple cardinality); for byRow=false union semantics, explode " +
            "the fields into one column first")
      if (t == "arrayOfDoublesSketch")
        opt(n, "numberOfValues").map(_.asInt).foreach(nv =>
          require(nv == fields.size,
            s"arrayOfDoublesSketch numberOfValues $nv != " +
              s"metricColumns size ${fields.size}"))
      AggregatorSpec(
        aggType = t,
        name = str(n, "name", ""),
        fieldName = opt(n, "fieldName").map(_.asText),
        fields = fields,
        probabilities = opt(n, "probabilities").toSeq
          .flatMap(_.elements.asScala).map(_.asDouble),
        // `k` is the DataSketches extensions' size knob, `size` is
        // thetaSketch's, `nominalEntries` the tuple extension's — same role
        // as the engine's `accuracy` (explicit accuracy wins when several
        // are set)
        accuracy = opt(n, "accuracy").orElse(opt(n, "k"))
          .orElse(opt(n, "size")).orElse(opt(n, "nominalEntries")).map(_.asInt))
    }
  }
}
