package graft.config

import java.time.Duration

import graft.time.Granularity

/** Engine configuration mirroring the reference's user-facing schema language:
  * the Druid ingestion spec JSON that tranquility parses in
  * core/.../config/DataSourceConfig.scala + druid/DruidBeams.scala#fromConfig
  * (see SURVEY.md §1.2). The case classes are the engine's IR; a Jackson loader
  * ([[SpecLoader]]) accepts the same JSON shape.
  */

/** Timestamp extraction spec (druid-api TimestampSpec — SURVEY §2.2).
  * `format` ∈ auto | iso | posix | millis | &lt;java time pattern&gt;.
  */
final case class TimestampSpec(
    column: String = "timestamp",
    format: String = "auto",
    missingValue: Option[String] = scala.None)

/** One synthesized spatial dimension: `fieldNames` joined as "lat,lon".
  * Upstream: DruidRollup.scala#MultipleFieldDruidSpatialDimension (single-field
  * variant is the degenerate one-element list).
  */
final case class SpatialDimension(dimName: String, dims: Seq[String])

/** Dimension selection — the two reference modes (DruidRollup.scala):
  * fixed schema (SpecificDruidDimensions) vs schemaless
  * (SchemalessDruidDimensions: everything minus exclusions minus metric
  * inputs becomes a string dimension).
  */
sealed trait DimensionsSpec {
  def spatialDimensions: Seq[SpatialDimension]
}
/** @param multiValueHandling per-dimension Druid DimensionSchema
  *   multiValueHandling: SORTED_ARRAY (Druid's default — sorted, keeps
  *   duplicates) | SORTED_SET (sorted distinct) | ARRAY (as ingested)
  * @param dimTypes per-dimension declared type (Druid's typed dimension
  *   schemas: string/long/float/double) — cast at projection
  */
final case class SpecificDimensions(
    dimensions: Seq[String],
    spatialDimensions: Seq[SpatialDimension] = Nil,
    multiValueHandling: Map[String, String] = Map.empty,
    dimTypes: Map[String, String] = Map.empty) extends DimensionsSpec
final case class SchemalessDimensions(
    dimensionExclusions: Seq[String] = Nil,
    spatialDimensions: Seq[SpatialDimension] = Nil) extends DimensionsSpec

/** Aggregator declaration (metricsSpec entry). The set matches what appears in
  * tranquility's docs/tests (SURVEY §2.4): count, longSum, doubleSum, longMin,
  * longMax, doubleMin, doubleMax, hyperUnique, cardinality, approxHistogram,
  * plus the `filtered` wrapper, plus the mergeable STORAGE forms `hllSketch`,
  * `histogramSketch` and `thetaSketch` (binary sketch kept in the segment,
  * merged at read — for histogramSketch, `accuracy` = max centroid bins and
  * `probabilities` = quantiles finalized at query time; for thetaSketch,
  * `accuracy` = k retained minimum hashes, supporting distinct estimates AND
  * set intersection). `javascript` is NOT supported — the engine's
  * extension point for custom folds is a Spark `Aggregator` (see
  * [[graft.functions.CustomAggregators]]).
  */
final case class AggregatorSpec(
    aggType: String,
    name: String,
    fieldName: Option[String] = scala.None,
    /** for `filtered`: legacy dimension == value shorthand (kept for
      * programmatic callers; JSON parses into [[filterSpec]]) */
    filterDimension: Option[String] = scala.None,
    filterValue: Option[String] = scala.None,
    /** for `filtered`: the FULL Druid filter DSL (selector/in/and/or/not/
      * regex/like/bound) — Druid allows any query filter inside a filtered
      * aggregator, not just selector. Wins over the legacy pair when set. */
    filterSpec: Option[FilterSpec] = scala.None,
    /** for `filtered` with an extractionFn-bearing filter: the RAW filter
      * JSON. Only the query path can compile extraction filters (the
      * extraction compiler lives in DruidQueryCompiler); ingest-time
      * metricsSpec rejects these at LOAD. Exactly one of
      * filterSpec/filterJson is set for a DSL-filtered aggregator. */
    filterJson: Option[com.fasterxml.jackson.databind.JsonNode] = scala.None,
    /** delegate for `filtered` */
    aggregator: Option[AggregatorSpec] = scala.None,
    /** for `cardinality`/`hyperUnique`/`exactCardinality` over a dimension
      * TUPLE (Druid's cardinality `fields` with byRow=true: distinct
      * combinations). byRow=false (union of per-field value sets) is
      * rejected at load — explode the fields into one column instead. */
    fields: Seq[String] = Nil,
    /** for approxHistogram / percentile outputs */
    probabilities: Seq[Double] = Nil,
    /** approxHistogram sketch resolution (GK summary 1/relativeError). The
      * default matches Spark's `percentile_approx`; raise above 2·n to make the
      * sketch exact (no sample ever compresses away) for oracle comparison.
      */
    accuracy: Option[Int] = scala.None)

/** Druid postAggregations entry (upstream metricsSpec companion — Druid's
  * arithmetic / fieldAccess / constant post-aggregators): computed AFTER
  * rollup, over finalized metric columns. `arithmetic` with fn `/` follows
  * Druid's rule (0 when the divisor is 0); `quotient` is plain floating
  * division (NaN/Infinity propagate).
  */
final case class PostAggregatorSpec(
    paType: String, // arithmetic | fieldAccess | constant | expression
    name: String,
    /** for arithmetic: +, -, *, /, quotient */
    fn: String = "",
    fields: Seq[PostAggregatorSpec] = Nil,
    /** for fieldAccess: the finalized metric column to read */
    fieldName: Option[String] = scala.None,
    /** for constant */
    value: Option[Double] = scala.None,
    /** for `expression`: a row-level expression over finalized metric
      * columns. Same documented dialect delta as transformSpec — the
      * language is Spark SQL, not Druid's expr dialect. */
    expression: Option[String] = scala.None,
    /** for `thetaSketchSetOp`: UNION | INTERSECT | NOT */
    func: String = "",
    /** for `quantilesDoublesSketchToQuantile` */
    fraction: Option[Double] = scala.None,
    /** for `quantilesDoublesSketchToQuantiles` */
    fractions: Seq[Double] = Nil,
    /** for `quantilesDoublesSketchToCDF` / `…ToHistogram` */
    splitPoints: Seq[Double] = Nil)

final case class GranularitySpec(
    segmentGranularity: Granularity = Granularity.Hour,
    queryGranularity: Granularity = Granularity.None,
    rollup: Boolean = true)

/** Tuning knobs with the reference's defaults
  * (beam/ClusteredBeamTuning.scala + tranquilizer/Tranquilizer.scala — see
  * BASELINE.md). `partitions`/`replicants` become shuffle-partitioning hints;
  * replication itself is delegated to the storage layer (SURVEY §2.10).
  */
final case class Tuning(
    windowPeriod: Duration = Duration.ofMinutes(10),
    partitions: Int = 1,
    replicants: Int = 1,
    maxBatchSize: Int = 2000,
    maxPendingBatches: Int = 5,
    lingerMillis: Long = 0L,
    warmingPeriod: Duration = Duration.ZERO,
    /** at-source event dedup: duplicate deliveries sharing these (projected
      * dimension) keys collapse within the windowPeriod horizon —
      * `dropDuplicatesWithinWatermark` state, never outliving what the
      * lateness filter would drop anyway */
    dedupKeys: Seq[String] = Nil)

/** Druid ingestion filter (the `transformSpec.filter` DSL subset users
  * actually write: selector / in / and / or / not). */
sealed trait FilterSpec
final case class SelectorFilter(dimension: String, value: String) extends FilterSpec
final case class InFilter(dimension: String, values: Seq[String]) extends FilterSpec
final case class AndFilter(fields: Seq[FilterSpec]) extends FilterSpec
final case class OrFilter(fields: Seq[FilterSpec]) extends FilterSpec
final case class NotFilter(field: FilterSpec) extends FilterSpec
/** Druid `regex` filter: dimension matches a (Java) regex anywhere. */
final case class RegexFilter(dimension: String, pattern: String) extends FilterSpec
/** Druid `like` filter: SQL LIKE with % and _ wildcards. */
final case class LikeFilter(dimension: String, pattern: String) extends FilterSpec
/** Druid `interval` filter: the dimension (typically `__time`, a timestamp
  * column) falls in any of the ISO-8601 `start/end` intervals — end
  * exclusive. Endpoints resolve to epoch millis at parse time
  * ([[graft.time.Intervals]]). */
final case class IntervalFilter(dimension: String, intervals: Seq[String])
    extends FilterSpec
/** Druid `bound` filter: range with open/closed ends, lexicographic (string
  * compare) or numeric ordering. Absent bounds are unbounded. */
final case class BoundFilter(
    dimension: String,
    lower: Option[String] = scala.None,
    upper: Option[String] = scala.None,
    lowerStrict: Boolean = false,
    upperStrict: Boolean = false,
    ordering: String = "lexicographic") extends FilterSpec

/** Druid `search` filter: dimension CONTAINS a value ("contains" query
  * spec, case-sensitive or not). Distinct from the `search` QUERY type. */
final case class SearchFilter(dimension: String, value: String,
    caseSensitive: Boolean = false) extends FilterSpec
/** Druid `columnComparison` filter: two dimension columns are equal (null
  * == null matches, per Druid). */
final case class ColumnComparisonFilter(dimensions: Seq[String]) extends FilterSpec
/** Druid `expression` filter — same documented dialect delta as
  * [[TransformField]]: the expression is Spark SQL. */
final case class ExpressionFilter(expression: String) extends FilterSpec
/** Druid `true` / `false` filters (constant match / drop-all). */
final case class TrueFilter() extends FilterSpec
final case class FalseFilter() extends FilterSpec
/** Druid spatial filter, rectangular bound: the dimension is a synthesized
  * spatial dim ([[SpatialDimension]], "lat,lon" string); a row matches when
  * every coordinate lies in [min_i, max_i] — INCLUSIVE both ends, upstream
  * RectangularBound semantics. */
final case class SpatialRectFilter(dimension: String,
    minCoords: Seq[Double], maxCoords: Seq[Double]) extends FilterSpec
/** Druid spatial filter, radius bound: Euclidean distance from `coords`
  * ≤ `radius` (upstream RadiusBound). */
final case class SpatialRadiusFilter(dimension: String,
    coords: Seq[Double], radius: Double) extends FilterSpec
/** Druid spatial filter, polygon bound: even-odd ray-casting
  * point-in-polygon over (abscissa[i], ordinate[i]) vertices — upstream
  * PolygonBound semantics (2-D only; the first two coords of the spatial
  * dim are (x, y)). */
final case class SpatialPolygonFilter(dimension: String,
    abscissa: Seq[Double], ordinate: Seq[Double]) extends FilterSpec

/** Druid `null` filter (Druid 26+ typed-filter family): matches rows where
  * the column IS NULL — the explicit complement of every other filter's
  * "null never matches" rule (upstream `NullFilter`). */
final case class NullFilter(column: String) extends FilterSpec
/** Druid `equality` filter (Druid 26+, the SQL planner's default when
  * `sqlUseBoundAndSelectors=false`): typed equality against a non-null
  * matchValue. STRING compares as string; LONG/FLOAT/DOUBLE compare
  * numerically (unparseable column values never match). Upstream
  * `EqualityFilter`. */
final case class EqualityFilter(column: String, matchValueType: String,
    value: String) extends FilterSpec
/** Druid `range` filter (Druid 26+): typed range with open/closed ends —
  * `lowerOpen`/`upperOpen` true = strict. Replaces `bound`'s
  * ordering-string with an explicit matchValueType. Upstream
  * `RangeFilter`. */
final case class TypedRangeFilter(column: String, matchValueType: String,
    lower: Option[String] = scala.None,
    upper: Option[String] = scala.None,
    lowerOpen: Boolean = false,
    upperOpen: Boolean = false) extends FilterSpec

/** One derived column. DOCUMENTED DELTA: the expression language is Spark
  * SQL (codegen'd, no interpreter), not Druid's own expr dialect — same
  * role (row-level derivations visible to dims and aggregators), richer
  * function set. */
final case class TransformField(name: String, expression: String)

/** Druid `transformSpec`: row-level derived columns + an ingest-time row
  * filter, applied before projection so transforms can feed dimensions AND
  * aggregator inputs. */
final case class TransformSpec(
    transforms: Seq[TransformField] = Nil,
    filter: Option[FilterSpec] = scala.None)

/** Druid parseSpec format (upstream ParseSpec subclasses): how raw record
  * VALUES (Kafka bytes, spooled lines) become columns. `json` uses the
  * declared value schema; `csv`/`tsv`/`delimited` split on `delimiter`
  * with the schema's field order (a declared `columns` list must match
  * it — fail at load, not first record); `regex` maps capture group i+1
  * to schema field i. javascript is out of scope (no JS engine by
  * design, same stance as the javascript aggregator). */
/** One flattenSpec field: `name` becomes a column from the JSONPath
  * `expr` (Druid `path` type; `root` is name-at-top-level shorthand). */
final case class FlattenField(name: String, expr: String)

final case class ParserSpec(
    format: String = "json",
    columns: Seq[String] = Nil,
    delimiter: String = ",",
    pattern: Option[String] = scala.None,
    /** json format only: nested paths lifted to columns (Druid flattenSpec;
      * non-flattened schema fields keep reading from the root object). */
    flatten: Seq[FlattenField] = Nil)

final case class DataSchema(
    dataSource: String,
    timestampSpec: TimestampSpec,
    dimensionsSpec: DimensionsSpec,
    aggregators: Seq[AggregatorSpec],
    granularitySpec: GranularitySpec = GranularitySpec(),
    postAggregations: Seq[PostAggregatorSpec] = Nil,
    transformSpec: TransformSpec = TransformSpec(),
    parser: ParserSpec = ParserSpec())

final case class IngestionSpec(
    dataSchema: DataSchema,
    tuning: Tuning = Tuning()) {

  /** Reject name collisions between dimensions, aggregator output names and the
    * timestamp column — semantics of upstream DruidRollup.scala#validate
    * (SURVEY §2.2 "validation predicate"). Analyzer-time: throws before any
    * query starts.
    */
  def validate(): this.type = {
    val aggNames = dataSchema.aggregators.map(_.name)
    val dimNames = dataSchema.dimensionsSpec match {
      case sd: SpecificDimensions =>
        sd.dimensions ++ sd.spatialDimensions.map(_.dimName)
      case SchemalessDimensions(_, spatial) => spatial.map(_.dimName)
    }
    val all = (aggNames ++ dimNames) :+ dataSchema.timestampSpec.column
    val dups = all.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"Duplicate field names in ingestion spec: ${dups.mkString(", ")}")
    val exclusionClash = dataSchema.dimensionsSpec match {
      case SchemalessDimensions(excl, _) => excl.intersect(aggNames)
      case _                             => Nil
    }
    if (exclusionClash.nonEmpty)
      throw new IllegalArgumentException(
        s"dimensionExclusions collide with metric names: ${exclusionClash.mkString(", ")}")
    // engine-reserved columns: the pipeline OVERWRITES `segment` (partition
    // key), `__ts` (normalized event time), `__graft_raw_ts` and
    // `__batch_id` — a dim or metric with one of those names would be
    // silently clobbered at rest (wrong data, no error; review finding r7)
    val reserved = Set("segment", "__ts", "__graft_raw_ts", "__batch_id")
    val reservedClash = (aggNames ++ dimNames).filter(reserved)
    if (reservedClash.nonEmpty)
      throw new IllegalArgumentException(
        s"field names collide with engine-reserved columns " +
          s"(${reserved.toSeq.sorted.mkString(", ")}): " +
          reservedClash.mkString(", "))
    this
  }
}
