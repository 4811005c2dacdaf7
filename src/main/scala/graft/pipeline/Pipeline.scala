package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config._

/** The engine's core: config → declarative DataFrame stages.
  *
  * Re-expresses the reference's ingest path (SURVEY §3.1: Tranquilizer →
  * ClusteredBeam → HashPartitionBeam → DruidBeam, upstream
  * core/.../tranquilizer/Tranquilizer.scala + beam/ClusteredBeam.scala) as a
  * logical-plan pipeline: parse → timestamp → window filter (with drop
  * accounting) → dimension projection → rollup aggregation. Every stage is a
  * pure `DataFrame => DataFrame`, so Catalyst sees one plan and can push
  * filters into the scan, prune columns, and pick partial+final hash
  * aggregation — the scale story at 100 TB is "one shuffle, on the grouping
  * key, with map-side combine", which this construction guarantees.
  *
  * Column-name conventions: `__ts` = extracted event timestamp; `segment` =
  * segmentGranularity bucket (output partition key — the analog of the
  * reference's per-chunk beam/task, SURVEY §2.9).
  */
class Pipeline(val spec: IngestionSpec) extends Serializable {
  spec.validate()

  import Pipeline._

  private def schema = spec.dataSchema
  private def gran = schema.granularitySpec

  // ---------------------------------------------------------------- timestamp

  /** Timestamp extraction per TimestampSpec (SURVEY §2.2; upstream
    * druid/DruidBeams.scala#Builder.timestampSpec). Produces `__ts`.
    */
  def extractTimestamp(df: DataFrame): DataFrame = {
    val ts = schema.timestampSpec
    val c = col(ts.column)
    val parsed: Column = ts.format match {
      case "auto"   =>
        df.schema(ts.column).dataType match {
          case TimestampType          => c
          // vanilla parquet timestamp[us] with isAdjustedToUTC=false reads as
          // NTZ; the session zone is UTC so the cast is value-identical
          case TimestampNTZType       => c.cast(TimestampType)
          case DateType               => c.cast(TimestampType)
          case LongType | IntegerType => millisOrSeconds(c)
          case _ => coalesce(try_to_timestamp(c),
                      millisOrSeconds(expr(s"try_cast(`${ts.column}` AS BIGINT)")))
        }
      case "iso"    => to_timestamp(c)
      case "posix"  => timestamp_seconds(c.cast(LongType))
      case "millis" => timestamp_millis(c.cast(LongType))
      case fmt      => to_timestamp(c, fmt)
    }
    val withMissing = ts.missingValue match {
      case Some(mv) => coalesce(parsed, to_timestamp(lit(mv)))
      case None     => parsed
    }
    df.withColumn(TsCol, withMissing)
  }

  /** Heuristic for "auto" numeric timestamps, by epoch MAGNITUDE: ≥1e17 →
    * nanos, ≥1e14 → micros, ≥1e12 → millis, else seconds. Post-1970 epochs in
    * the four units sit ~3 decades apart (1.7e9 s / 1.7e12 ms / 1.7e15 µs /
    * 1.7e18 ns), so the rungs are unambiguous for any realistic date. The
    * rungs compare |value| so pre-1970 instants (negative epochs) resolve in
    * the same unit as their positive mirror instead of all falling to
    * seconds (review finding r7: -86400000 is 1969-12-31 in millis, not year
    * -768). The ns→µs floor goes through decimal, not double: ns epochs need
    * 61 bits, beyond double's exact-integer range.
    */
  private def millisOrSeconds(c: Column): Column = {
    val l = c.cast(LongType)
    val m = abs(l)
    when(m >= 100000000000000000L,
        timestamp_micros(floor(l.cast(DecimalType(38, 0)) / 1000).cast(LongType)))
      .when(m >= 100000000000000L, timestamp_micros(l))
      .when(m >= 1000000000000L, timestamp_millis(l))
      .otherwise(timestamp_seconds(l))
  }

  // ------------------------------------------------------------ window period

  /** windowPeriod acceptance predicate: ts ∈ [now − w, now + w]. Upstream
    * ClusteredBeam.scala#sendAll drops events outside the window and resolves
    * their futures `sent=false` (SURVEY §2.2) — drop accounting is
    * reference-visible behavior, so we `observe` received/sent counts rather
    * than silently filtering. `now` is injected (test clock = lit; production =
    * current_timestamp()) mirroring the reference's TestingTimekeeper.
    */
  def windowFilter(df: DataFrame, now: Column,
                   observationName: String = "graft_window"): DataFrame = {
    val w = spec.tuning.windowPeriod.getSeconds
    val cond = col(TsCol).isNotNull &&
      col(TsCol) >= now - expr(s"INTERVAL $w SECOND") &&
      col(TsCol) <= now + expr(s"INTERVAL $w SECOND")
    df.observe(observationName,
        count(lit(1)).as("received"),
        count(when(cond, 1)).as("sent"),
        count(when(!cond, 1)).as("dropped"))
      .filter(cond)
  }

  // ---------------------------------------------------------------- projection

  /** Dimension projection (SURVEY §2.2): specific → select declared dims;
    * schemaless → every other column (minus exclusions, metric inputs, metric
    * names) cast to string. Spatial dims synthesized via concat_ws (upstream
    * MultipleFieldDruidSpatialDimension).
    */
  /** Druid `transformSpec` analog: row-level derived columns (Spark SQL
    * expressions — documented delta vs Druid's own expr dialect, see
    * [[graft.config.TransformField]]) plus the ingest-time row filter.
    * Runs at the head of [[project]] so transform outputs can serve as
    * dimensions and aggregator inputs; the filter sees transformed rows
    * (Druid's order). No-op for specs without a transformSpec.
    */
  def transform(df: DataFrame): DataFrame = {
    val t = schema.transformSpec
    val withCols = t.transforms.foldLeft(df) { (d, tf) =>
      require(tf.name.nonEmpty && tf.expression.nonEmpty,
        s"transform needs name and expression, got $tf")
      d.withColumn(tf.name, expr(tf.expression))
    }
    t.filter.map(f => withCols.filter(filterColumn(f))).getOrElse(withCols)
  }

  /** Filter DSL compilation lives in [[Filters]] (shared with the query-time
    * compiler — in Druid `transformSpec.filter` and the native query `filter`
    * clause speak the same DSL).
    */
  private def filterColumn(f: graft.config.FilterSpec): Column = Filters.toColumn(f)

  def project(df: DataFrame): DataFrame = {
    val projectable = transform(df)
    projectImpl(projectable)
  }

  private def projectImpl(df: DataFrame): DataFrame = {
    val aggInputs = schema.aggregators.flatMap(Aggregators.inputFields).distinct
    val spatial = schema.dimensionsSpec.spatialDimensions.map { s =>
      concat_ws(",", s.dims.map(d => col(d).cast(StringType)): _*).as(s.dimName)
    }
    val dims: Seq[Column] = schema.dimensionsSpec match {
      // multi-value string dims (Druid ArrayType mapping — SURVEY §1.3):
      // normalized at ingest per the dimension's multiValueHandling
      // (Druid DimensionSchema): SORTED_ARRAY (Druid's default — sorted,
      // duplicates kept), SORTED_SET (sorted distinct), ARRAY (as
      // ingested). Rollup then groups by the normalized array; per-value
      // groupBy semantics = [[explodeMultiValueDim]]. Typed dimension
      // schemas (long/float/double) cast at projection.
      case sd: SpecificDimensions => sd.dimensions.map { n =>
        val base = df.schema.fields.find(_.name == n).map(_.dataType) match {
          case Some(ArrayType(_, _)) =>
            sd.multiValueHandling.getOrElse(n, "SORTED_ARRAY") match {
              case "SORTED_ARRAY" => array_sort(col(n))
              case "SORTED_SET"   => array_sort(array_distinct(col(n)))
              case "ARRAY"        => col(n)
              case other => throw new IllegalArgumentException(
                s"multiValueHandling '$other' for dimension '$n' " +
                  "(SORTED_ARRAY/SORTED_SET/ARRAY)")
            }
          case _ => col(n)
        }
        (sd.dimTypes.get(n) match {
          case Some("long")   => base.cast(org.apache.spark.sql.types.LongType)
          case Some("float")  => base.cast(org.apache.spark.sql.types.FloatType)
          case Some("double") => base.cast(org.apache.spark.sql.types.DoubleType)
          case Some("string") | scala.None => base
          case Some(other) => throw new IllegalArgumentException(
            s"dimension type '$other' for '$n' (string/long/float/double)")
        }).as(n)
      }
      case SchemalessDimensions(excl, spatialDims) =>
        val reserved = (excl ++ aggInputs ++ schema.aggregators.map(_.name) ++
          spatialDims.flatMap(_.dims) :+ schema.timestampSpec.column :+ TsCol).toSet
        df.columns.toSeq.filterNot(reserved)
          .map(c => col(c).cast(StringType).as(c))
    }
    // an aggregator input that is ALSO a declared dimension must not be
    // selected twice (AMBIGUOUS_REFERENCE in the downstream groupBy)
    val dimNamesSelected = schema.dimensionsSpec match {
      case sd: SpecificDimensions => sd.dimensions.toSet
      case _                      => Set.empty[String]
    }
    val metricCols = aggInputs
      .filterNot(dimNamesSelected.contains)
      // TsCol is ALWAYS selected first — an aggregator (or filtered-agg
      // filter) referencing the event time must not select it twice
      // (AMBIGUOUS_REFERENCE in rollup's RawTsCol copy; review finding r7)
      .filterNot(_ == TsCol)
      .filter(df.columns.contains).map(col)
    df.select((col(TsCol) +: (dims ++ spatial ++ metricCols)): _*)
  }

  /** Druid groupBy semantics over a multi-value dimension: each row
    * contributes once per distinct value (the values were already deduped by
    * [[project]]'s SORTED_ARRAY normalization). Run between project and
    * rollup when per-value grouping is wanted instead of set grouping.
    */
  def explodeMultiValueDim(df: DataFrame, dim: String): DataFrame =
    df.withColumn(dim, explode(col(dim)))

  /** Schemaless projection over a MapType payload column: non-excluded map
    * entries become string dims via map_filter (SURVEY §2.8), keeping the t2
    * surface deterministic (no per-batch schema inference).
    */
  def projectMapPayload(df: DataFrame, mapColumn: String): DataFrame = {
    val excl = schema.dimensionsSpec match {
      case SchemalessDimensions(e, _) => e
      case _: SpecificDimensions      => Nil
    }
    val exclArr = array((excl ++ schema.aggregators.map(_.name)).map(lit): _*)
    df.withColumn(mapColumn,
      map_filter(col(mapColumn), (k, _) => !array_contains(exclArr, k)))
  }

  // -------------------------------------------------------------------- rollup

  /** Segment bucket column (upstream ClusteredBeamTuning#segmentBucket):
    * drives output partitioning — the analog of one Druid task per chunk.
    */
  def withSegment(df: DataFrame): DataFrame =
    df.withColumn(SegmentCol, gran.segmentGranularity.truncate(col(TsCol)))

  /** Ingest-time rollup (the heart of the reference — SURVEY §2.4):
    * groupBy(truncate(ts, queryGranularity), dims…).agg(aggregators…).
    * With rollup=false, raw rows are appended unmodified (upstream
    * DruidRollup.isRollup), pre-shuffled by (segment, dims) to maximize
    * locality — the GenericTimeAndDimsPartitioner analog (SURVEY §2.10);
    * for the rollup path Catalyst's shuffle-before-HashAggregate already
    * colocates by grouping key, so no explicit repartition is added.
    */
  def rollup(df: DataFrame): DataFrame = {
    // idempotent: sketch aggregators (histogramSketch) resolve through the
    // session function registry
    graft.functions.GraftFunctions.register(df.sparkSession)
    val dimCols = dimensionNames(df).map(col)
    if (!gran.rollup) {
      val out = withSegment(df)
      if (spec.tuning.partitions > 1)
        out.repartition(spec.tuning.partitions, col(SegmentCol) +: dimCols: _*)
      else out
    } else {
      // keep the raw event time for order-sensitive aggregators (first/last)
      // before the bucket key overwrites it
      val bucketed = df.withColumn(RawTsCol, col(TsCol))
        .withColumn(TsCol, gran.queryGranularity.truncate(col(TsCol)))
      // filtered-agg filters naming the event-time column compare against
      // the RAW time (Druid's rule), not the bucket written above
      val aggs = schema.aggregators
        .map(Aggregators.remapFilterTime(_, TsCol, RawTsCol))
        .map(Aggregators.toColumn) match {
        case Nil => Seq(count(lit(1)).as("rows"))
        case xs  => xs
      }
      bucketed.groupBy(col(TsCol) +: dimCols: _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Apply the spec's Druid-style postAggregations over FINALIZED metric
    * columns (after [[rollup]] or [[graft.sink.SegmentStore.read]] — post
    * aggs never see partials, matching Druid where they run at query time
    * on merged results). No-op for a spec without postAggregations.
    */
  def postAggregate(df: DataFrame): DataFrame =
    schema.postAggregations.foldLeft(df)((d, p) =>
      d.withColumn(p.name, Aggregators.postAggColumn(p)))

  /** Declared dimension names present in `df` (post-projection). */
  def dimensionNames(df: DataFrame): Seq[String] = {
    val spatial = schema.dimensionsSpec.spatialDimensions.map(_.dimName)
    schema.dimensionsSpec match {
      case sd: SpecificDimensions =>
        (sd.dimensions ++ spatial).filter(df.columns.contains)
      case SchemalessDimensions(_, _) =>
        val aggInputs = schema.aggregators.flatMap(Aggregators.inputFields).toSet
        val reserved = aggInputs ++ schema.aggregators.map(_.name) +
          TsCol + RawTsCol + SegmentCol + schema.timestampSpec.column
        df.columns.toSeq.filterNot(reserved.contains)
    }
  }

  // ------------------------------------------------------------------ combined

  /** Full batch pipeline: timestamp → windowFilter(now) → project → rollup →
    * segment column. The single composition point the sinks/sources use.
    * `decorate` mirrors the reference's beamDecorateFn hook
    * (druid/DruidBeams.scala#Builder — SURVEY §2.8).
    */
  def apply(df: DataFrame, now: Column,
            decorate: DataFrame => DataFrame = identity): DataFrame = {
    val staged = rollup(project(windowFilter(extractTimestamp(df), now)))
    val out = if (gran.rollup) withSegment(staged) else staged
    decorate(out)
  }
}

object Pipeline {
  val TsCol = "__ts"
  /** pre-truncation event time, visible to order-sensitive aggregators
    * (first/last) inside the rollup groupBy — the bucket key is TsCol. */
  val RawTsCol = "__graft_raw_ts"
  val SegmentCol = "segment"
}
