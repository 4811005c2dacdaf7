package graft.queries

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.config.SpecLoader
import graft.pipeline.{Aggregators, Filters, Pipeline}
import graft.time.Granularity

/** Compiles Druid NATIVE QUERY JSON to a DataFrame plan — the query-side
  * twin of [[graft.config.SpecLoader]] (which compiles the ingestion spec).
  * Tranquility itself is ingest-only, but every tranquility deployment pairs
  * it with Druid's query API (SURVEY §2.9 query analogs); this compiler lets
  * a user run those same query JSONs against the engine's tables/stores.
  *
  * Supported queryTypes — the full Druid native set:
  *  - `timeseries`   granularity bucketing + aggs + postAggs
  *  - `topN`         per-bucket dimension top-k by metric (numeric /
  *                   inverted / dimension orderings)
  *  - `groupBy`      dimensionSpecs (default + extraction fns) + having +
  *                   limitSpec (metric-ordered limit/offset)
  *  - `scan`         column projection + time order + limit/offset
  *  - `select`       (legacy, removed upstream 0.17 — tranquility-era
  *                   Druid queried through it) raw events with
  *                   per-segment paging offsets + pagingIdentifiers resume
  *  - `search`       per-dimension value matching (contains /
  *                   insensitive_contains / fragment)
  *  - `timeBoundary` min/max event time (bound: minTime | maxTime | both)
  *  - `dataSourceMetadata` max ingested event time
  *  - `segmentMetadata` per-column type/cardinality/min/max/null-count in
  *                   one pass (exact cardinality — documented delta)
  *  - `movingAverage` (upstream extension) trailing-window averagers over
  *                   a zero-filled timeseries/groupBy, time range extended
  *                   backward so the first bucket has a full window
  *
  * Shared sub-languages reuse the ingest-side compilers: `filter` →
  * [[graft.pipeline.Filters]] (Druid null semantics), `aggregations` →
  * [[graft.pipeline.Aggregators]] (incl. stored-sketch + first/last types),
  * `postAggregations` → [[Aggregators.postAggColumn]], `granularity` →
  * [[graft.time.Granularity]] (named / duration / period forms),
  * `virtualColumns` → Spark SQL expressions (same documented dialect delta
  * as transformSpec).
  *
  * Conventions: the event-time column is Druid's `__time`; every aggregate
  * query emits its bucket as `__time` (granularity `all` → epoch 0, one
  * bucket — callers project it away as Druid's result envelope does).
  * Dimension output keeps the input column's native type (documented delta:
  * Druid coerces dimensions to string unless told otherwise; a caller
  * wanting that casts in a virtualColumn).
  *
  * Scale shape: aggregate types are one shuffle on (bucket, dims) with
  * map-side partial agg; topN/limitSpec rank through a bucket-partitioned
  * window (WindowGroupLimit pushes the threshold below the Exchange);
  * interval + filter conjuncts sit directly above the scan so Catalyst
  * pushes them into the parquet reader.
  */
object DruidQueryCompiler {

  /** Druid's event-time column; inputs must carry it. */
  val TimeCol = "__time"

  private val mapper = new ObjectMapper()

  /** Exact-name column reference (join-prefixed names carry dots) —
    * [[graft.pipeline.Cols]]. The one STRUCT-EXPANSION use in this file
    * (`m.*`, segmentMetadata) dodges the shadow explicitly. */
  private def col(name: String): Column = graft.pipeline.Cols.exact(name)

  /** Compile `json` against `resolve` (dataSource name → table). The full
    * dataSource algebra: `table` / `union` (unionByName, missing columns
    * null-filled — Druid's semantics over mismatched datasources) /
    * `query` (sub-query results as input) / `join` (broadcast-global right
    * side: lookup, inline, or query) / `inline` / `lookup`.
    */
  def compile(json: String, resolve: String => DataFrame): DataFrame = {
    val root = mapper.readTree(json)
    val base = dataSource(opt(root, "dataSource").getOrElse(
      throw new IllegalArgumentException("query needs a dataSource")), resolve)
    require(base.columns.contains(TimeCol),
      s"dataSource is missing the '$TimeCol' event-time column")

    val prepared = filtered(virtual(base, root), root)

    str(root, "queryType", "") match {
      case "timeseries"         => timeseries(prepared, root)
      case "topN"               => topN(prepared, root)
      case "groupBy"            => groupBy(prepared, root)
      case "scan"               => scan(prepared, root)
      case "search"             => search(prepared, root)
      case "timeBoundary"       => timeBoundary(prepared, root)
      case "dataSourceMetadata" =>
        prepared.agg(max(col(TimeCol)).as("maxIngestedEventTime"))
      case "segmentMetadata"    => segmentMetadata(prepared, root)
      // movingAverage extends the time range backward itself — pass the DSL-
      // filtered frame WITHOUT the intervals clause applied
      case "movingAverage"      =>
        movingAverage(dslFiltered(virtual(base, root), root), root)
      case "select"             => select(prepared, root)
      case other => throw new IllegalArgumentException(
        s"unsupported queryType '$other' (timeseries/topN/groupBy/scan/" +
          "select/search/timeBoundary/dataSourceMetadata/segmentMetadata/" +
          "movingAverage)")
    }
  }

  // ------------------------------------------------------------------ inputs

  /** `session` builds frames for the SOURCE-LESS dataSource types (inline
    * / lookup). A join threads its LEFT side's session through so both
    * join inputs live on one SparkSession (the daemon may isolate
    * requests via newSession); only a standalone inline/lookup falls back
    * to the thread's active session. */
  private def dataSource(n: JsonNode, resolve: String => DataFrame,
      session: => org.apache.spark.sql.SparkSession =
        org.apache.spark.sql.SparkSession.active): DataFrame =
    if (n.isTextual) resolve(n.asText)
    else str(n, "type", "") match {
      case "table" => resolve(str(n, "name", ""))
      case "union" =>
        val members = opt(n, "dataSources").toSeq.flatMap(_.elements.asScala)
        require(members.nonEmpty, "union dataSource needs dataSources")
        members.map(dataSource(_, resolve))
          .reduce(_.unionByName(_, allowMissingColumns = true))
      // nested query dataSource (Druid sub-queries): compile the inner
      // query and use its RESULT as the outer input — Catalyst fuses the
      // two plans, so e.g. groupBy-over-groupBy stays two aggregations in
      // one job, no materialization boundary
      case "query" =>
        val inner = opt(n, "query").getOrElse(throw new IllegalArgumentException(
          "query dataSource needs a query"))
        val compiled = compile(mapper.writeValueAsString(inner), resolve)
        require(compiled.columns.contains(TimeCol),
          "query dataSource's inner query must emit __time (aggregate " +
            "queryTypes do; scan can project it)")
        compiled
      // Druid inline dataSource: columnNames + rows, types explicit
      // (columnTypes: string/long/double) or inferred from the values
      case "inline" => inline(n, session)
      // Druid lookup dataSource: the registered map as its (k, v) table
      case "lookup" =>
        val name = str(n, "lookup", "")
        require(name.nonEmpty, "lookup dataSource needs a lookup name")
        val mapping = Lookups.get(name).getOrElse(
          throw new IllegalArgumentException(
            s"lookup dataSource '$name' is not registered"))
        val spark = session
        import spark.implicits._
        mapping.toSeq.sortBy(_._1).toDF("k", "v")
      case "join" => join(n, resolve)
      // Druid unnest dataSource: explode the virtualColumn's array
      // expression into one row per element. Spark's explode drops
      // null/empty arrays — the same rows Druid's unnest skips — and the
      // optional unnestFilter applies to the UNNESTED column (Druid
      // evaluates it per emitted row, exactly a post-explode filter).
      case "unnest" =>
        val base = dataSource(opt(n, "base").getOrElse(
          throw new IllegalArgumentException("unnest dataSource needs a base")),
          resolve, session)
        val vc = opt(n, "virtualColumn").getOrElse(
          throw new IllegalArgumentException(
            "unnest dataSource needs a virtualColumn"))
        require(str(vc, "type", "expression") == "expression",
          s"unsupported unnest virtualColumn type '${str(vc, "type", "")}'")
        val name = str(vc, "name", "")
        val e = str(vc, "expression", "")
        require(name.nonEmpty && e.nonEmpty,
          s"unnest virtualColumn needs name and expression, got $vc")
        require(!base.columns.contains(name),
          s"unnest output column '$name' collides with a base column")
        val exploded = base.withColumn(name, explode(expr(e)))
        opt(n, "unnestFilter")
          .map(f => exploded.filter(filterColumn(f))).getOrElse(exploded)
      case other => throw new IllegalArgumentException(
        s"unsupported dataSource type '$other' " +
          "(table/union/query/join/inline/lookup/unnest)")
    }

  private def inline(n: JsonNode,
      session: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
    val names = opt(n, "columnNames").toSeq.flatMap(_.elements.asScala)
      .map(_.asText).toSeq
    require(names.nonEmpty, "inline dataSource needs columnNames")
    val rows = opt(n, "rows").toSeq.flatMap(_.elements.asScala).toSeq
    require(rows.nonEmpty, "inline dataSource needs rows")
    rows.foreach(r => require(r.isArray && r.size == names.length,
      s"inline row $r must be an array of ${names.length} values"))
    val explicit = opt(n, "columnTypes")
      .map(_.elements.asScala.map(_.asText).toSeq)
    explicit.foreach(ts => require(ts.length == names.length,
      "columnTypes length must match columnNames"))
    val types: Seq[DataType] = names.indices.map { i =>
      explicit match {
        case Some(ts) => ts(i).toLowerCase(java.util.Locale.ROOT) match {
          case "string" => StringType
          case "long"   => LongType
          case "double" => DoubleType
          case other => throw new IllegalArgumentException(
            s"inline columnType '$other' not supported (string/long/double)")
        }
        case None =>
          // infer from ALL values, not the first: a single fractional
          // value anywhere widens the column to double (first-value
          // inference would silently truncate 2.5 into a long column)
          val vs = rows.map(_.get(i)).filter(v => v != null && !v.isNull)
          if (vs.isEmpty || !vs.forall(_.isNumber)) StringType
          else if (vs.forall(_.isIntegralNumber)) LongType
          else DoubleType
      }
    }
    val data: java.util.List[org.apache.spark.sql.Row] =
      rows.map { r =>
        org.apache.spark.sql.Row.fromSeq(names.indices.map { i =>
          val v = r.get(i)
          if (v == null || v.isNull) null
          else types(i) match {
            case LongType =>
              // fractional into a declared-long column is a loud error,
              // never a silent truncation
              require(v.isIntegralNumber, s"inline value $v is not a long")
              v.asLong
            case DoubleType =>
              require(v.isNumber, s"inline value $v is not a double"); v.asDouble
            case _ => v.asText
          }
        })
      }.asJava
    session.createDataFrame(data,
      StructType(names.zip(types).map { case (nm, t) =>
        StructField(nm, t, nullable = true) }))
  }

  /** Druid join dataSource. The right side must be GLOBAL (lookup / inline
    * / query) — Druid's own rule, and exactly the broadcast-safe shape: the
    * left (fact) side never shuffles; the right ships once per executor via
    * an explicit broadcast hint. Right columns are renamed under
    * `rightPrefix` (dots welcome — the whole compiler quotes exact names),
    * and the condition is a conjunction of column equalities in Druid's
    * syntax (`user == "r.k"`). Druid's full expression language on the
    * left operand is not emulated — a non-column operand is a loud error
    * (virtualColumns can pre-compute the expression). */
  private def join(n: JsonNode, resolve: String => DataFrame): DataFrame = {
    val left = dataSource(opt(n, "left").getOrElse(
      throw new IllegalArgumentException("join dataSource needs a left")),
      resolve)
    val rightNode = opt(n, "right").getOrElse(
      throw new IllegalArgumentException("join dataSource needs a right"))
    val rightType =
      if (rightNode.isTextual) "table" else str(rightNode, "type", "table")
    require(Set("lookup", "inline", "query")(rightType),
      s"join right side must be a global dataSource (lookup/inline/query), " +
        s"got '$rightType' — pre-aggregate a table through a query " +
        "dataSource to make it broadcastable")
    // right frames (inline/lookup) build on the LEFT side's session so a
    // daemon that isolates requests via newSession joins within one session
    val right = dataSource(rightNode, resolve, left.sparkSession)
    val prefix = str(n, "rightPrefix", "")
    require(prefix.nonEmpty, "join dataSource needs a non-empty rightPrefix")
    val collisions = left.columns.filter(_.startsWith(prefix))
    require(collisions.isEmpty,
      s"rightPrefix '$prefix' collides with left column(s) " +
        collisions.mkString(","))
    val renamed = right.toDF(right.columns.map(prefix + _).toIndexedSeq: _*)
    val how = str(n, "joinType", "").toUpperCase(java.util.Locale.ROOT) match {
      case "INNER" => "inner"
      case "LEFT"  => "left"
      case other => throw new IllegalArgumentException(
        s"join joinType must be INNER or LEFT, got '$other'")
    }
    left.join(broadcast(renamed),
      joinCondition(str(n, "condition", ""), left, renamed), how)
  }

  private def joinCondition(cond: String, left: DataFrame,
      right: DataFrame): Column = {
    require(cond.trim.nonEmpty, "join dataSource needs a condition")
    // (side, column): each equality must span LEFT and RIGHT — a same-side
    // term like `a == a` is always true and would silently degenerate into
    // a filtered CROSS join against the whole broadcast side (Druid
    // rejects those conditions too)
    def ref(tok: String): (Boolean, Column) = {
      val t = tok.trim
      val name =
        if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
          t.substring(1, t.length - 1)
        else t
      require(name.matches("""[A-Za-z_][A-Za-z0-9_.]*"""),
        s"join condition operand '$t' must be a plain or double-quoted " +
          "column reference")
      if (right.columns.contains(name)) (true, right(s"`$name`"))
      else if (left.columns.contains(name)) (false, left(s"`$name`"))
      else throw new IllegalArgumentException(
        s"join condition references unknown column '$name'")
    }
    cond.split("&&").toSeq.map { eq =>
      val sides = eq.split("==")
      require(sides.length == 2,
        s"join condition term '${eq.trim}' must be a single equality " +
          "(conjoin with &&)")
      val (aRight, a) = ref(sides(0))
      val (bRight, b) = ref(sides(1))
      require(aRight != bRight,
        s"join condition term '${eq.trim}' must compare a LEFT column " +
          "with a RIGHT column (same-side equalities degenerate to a " +
          "cross join)")
      a === b
    }.reduce(_ && _)
  }

  /** Druid virtualColumns — expression type only; the expression language is
    * Spark SQL (the transformSpec delta, [[graft.config.TransformField]]). */
  private def virtual(df: DataFrame, root: JsonNode): DataFrame =
    opt(root, "virtualColumns").toSeq.flatMap(_.elements.asScala)
      .foldLeft(df) { (d, v) =>
        require(str(v, "type", "expression") == "expression",
          s"unsupported virtualColumn type '${str(v, "type", "")}'")
        val name = str(v, "name", "")
        val e = str(v, "expression", "")
        require(name.nonEmpty && e.nonEmpty,
          s"virtualColumn needs name and expression, got $v")
        d.withColumn(name, expr(e))
      }

  /** intervals (OR of [start, end) on __time) + the filter DSL. */
  private def filtered(df: DataFrame, root: JsonNode): DataFrame =
    dslFiltered(intervalsColumn(root).map(df.filter).getOrElse(df), root)

  /** the filter DSL only (no intervals clause). Filters carrying an
    * `extractionFn` (Druid: selector/in/bound compare the EXTRACTED value)
    * compile here where the extraction compiler lives; plain subtrees
    * delegate to the shared [[Filters]]/[[SpecLoader]] path.
    */
  private def dslFiltered(df: DataFrame, root: JsonNode): DataFrame =
    opt(root, "filter")
      .map(f => df.filter(filterColumn(f))).getOrElse(df)

  private def hasExtraction(n: JsonNode): Boolean =
    opt(n, "extractionFn").isDefined ||
      opt(n, "fields").exists(_.elements.asScala.exists(hasExtraction)) ||
      opt(n, "field").exists(hasExtraction)

  /** Filter JSON → Column. Extraction-bearing nodes compare the extracted
    * value with the same never-NULL Druid null semantics as [[Filters]]
    * (null/missing extraction output never matches, so not() does). */
  private[queries] def filterColumn(n: JsonNode): Column =
    if (!hasExtraction(n)) Filters.toColumn(SpecLoader.parseFilter(n))
    else str(n, "type", "") match {
      case "and" => opt(n, "fields").toSeq.flatMap(_.elements.asScala)
        .map(filterColumn).reduceOption(_ && _).getOrElse(lit(true))
      case "or" => opt(n, "fields").toSeq.flatMap(_.elements.asScala)
        .map(filterColumn).reduceOption(_ || _).getOrElse(lit(false))
      case "not" => !filterColumn(opt(n, "field").getOrElse(
        throw new IllegalArgumentException("not filter needs a field")))
      case t @ ("selector" | "in" | "bound") =>
        val fn = opt(n, "extractionFn").getOrElse(
          throw new IllegalArgumentException(
            s"extraction filter '$t' reached without extractionFn"))
        val extracted = extraction(col(str(n, "dimension", "")), fn)
        // an EXPLICIT JSON null is a null-match, never the 4-char string
        // "null" (NullNode.asText's rendering — review finding r7; the
        // file's other NullNode consumers already handle this)
        def nonNull(k: String): Option[JsonNode] =
          opt(n, k).filterNot(_.isNull)
        val c = t match {
          case "selector" =>
            nonNull("value") match {
              case Some(v)    => extracted <=> lit(v.asText)
              case scala.None => extracted.isNull
            }
          case "in" =>
            val elems = opt(n, "values").toSeq
              .flatMap(_.elements.asScala).toSeq
            val vs = elems.filterNot(_.isNull).map(_.asText)
            val nullMatch =
              if (elems.exists(_.isNull)) extracted.isNull else lit(false)
            (extracted.isNotNull && extracted.isin(vs: _*)) || nullMatch
          case "bound" =>
            // delegate range semantics to the shared BoundFilter compile by
            // re-parsing the node minus extractionFn, over a renamed column?
            // — simpler: lexicographic-only on the extracted string
            require(str(n, "ordering", "lexicographic") == "lexicographic",
              "bound filter with extractionFn supports lexicographic ordering")
            val lo = nonNull("lower").map(v =>
              if (opt(n, "lowerStrict").exists(_.asBoolean))
                extracted > lit(v.asText) else extracted >= lit(v.asText))
            val hi = nonNull("upper").map(v =>
              if (opt(n, "upperStrict").exists(_.asBoolean))
                extracted < lit(v.asText) else extracted <= lit(v.asText))
            extracted.isNotNull &&
              (lo.toSeq ++ hi.toSeq).reduceOption(_ && _).getOrElse(lit(true))
        }
        c
      case other => throw new IllegalArgumentException(
        s"extractionFn is not supported on filter type '$other' " +
          "(selector/in/bound)")
    }

  private[queries] def intervalsColumn(root: JsonNode): Option[Column] = {
    val specs = opt(root, "intervals").toSeq.flatMap(_.elements.asScala)
      .map(_.asText)
    val conds = specs.map { s =>
      val parts = s.split("/", 2)
      require(parts.length == 2, s"interval '$s' is not start/end")
      col(TimeCol) >= tsLit(parts(0)) && col(TimeCol) < tsLit(parts(1))
    }
    conds.reduceOption(_ || _)
  }

  /** ISO-8601 instant → epoch millis, JVM-side so session-timezone settings
    * can't shift zoned inputs; zone-less inputs are UTC (Druid's default).
    */
  // ONE definition (graft.time.Intervals) — a private copy here had already
  // drifted past Intervals' date-only fallback (review finding r7), so
  // "2020-01-01/2020-01-02" failed on every native queryType
  private def instantMillis(s: String): Long =
    graft.time.Intervals.parseInstantMillis(s)

  /** ISO-8601 instant literal → timestamp Column. */
  private def tsLit(s: String): Column = timestamp_millis(lit(instantMillis(s)))

  /** parsed `intervals` clause as [start, end) epoch-millis pairs. */
  private def intervalMillis(root: JsonNode): Seq[(Long, Long)] =
    opt(root, "intervals").toSeq.flatMap(_.elements.asScala).map(_.asText)
      .map { s =>
        val parts = s.split("/", 2)
        require(parts.length == 2, s"interval '$s' is not start/end")
        (instantMillis(parts(0)), instantMillis(parts(1)))
      }

  private def granularity(root: JsonNode): Granularity =
    opt(root, "granularity") match {
      case scala.None => Granularity.All
      case Some(n) if n.isTextual => Granularity.fromString(n.asText)
      case Some(n) => str(n, "type", "") match {
        case "duration" =>
          val ms = opt(n, "duration").map(_.asLong).getOrElse(
            throw new IllegalArgumentException("duration granularity needs duration"))
          require(ms > 0 && ms % 1000 == 0,
            s"duration granularity must be a positive whole-second millis value, got $ms")
          Granularity.Duration(ms / 1000)
        // calendar-period mapping shared with the SQL TIME_* family and
        // PARTITIONED BY (one definition in Granularity.fromPeriod)
        case "period" => Granularity.fromPeriod(str(n, "period", ""))
        case other => throw new IllegalArgumentException(
          s"unsupported granularity type '$other' (duration/period or a name)")
      }
    }

  /** Object-form `granularity.timeZone` (Druid PeriodGranularity): the
    * bucketing calendar's zone. None for absent/UTC — ANY fixed
    * zero-offset zone counts as UTC ('GMT', 'Etc/GMT', '+00', 'UTC+0', …:
    * detected from the zone RULES, not a literal whitelist), so effectively
    * -UTC queries keep the UTC default of dense zero-fill. Unknown zones
    * are a loud plan-time error — NEVER a silently ignored key. */
  private def granularityZone(root: JsonNode): Option[String] =
    opt(root, "granularity").filter(!_.isTextual)
      .flatMap(n => opt(n, "timeZone")).map(_.asText)
      .map { tz =>
        require(scala.util.Try(java.time.ZoneId.of(tz)).isSuccess,
          s"granularity: unknown timeZone '$tz'")
        tz
      }.filterNot { tz =>
        val rules = java.time.ZoneId.of(tz).getRules
        rules.isFixedOffset && rules.getOffset(java.time.Instant.EPOCH) ==
          java.time.ZoneOffset.UTC
      }

  /** Object-form `granularity.origin` (Druid PeriodGranularity): anchor
    * instant for fixed-width buckets, as epoch millis. ISO strings and
    * numeric millis accepted; None when absent. */
  private def granularityOrigin(root: JsonNode): Option[Long] =
    opt(root, "granularity").filter(!_.isTextual)
      .flatMap(n => opt(n, "origin")).map { o =>
        if (o.isNumber) o.asLong
        else {
          val s = o.asText
          scala.util.Try(java.time.Instant.parse(s).toEpochMilli).getOrElse(
            scala.util.Try(java.time.LocalDateTime.parse(s)
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli).getOrElse(
              throw new IllegalArgumentException(
                s"granularity: unparseable origin '$s'")))
        }
      }

  /** Bucket an instant by `g` under the object-form granularity modifiers
    * (Druid's PeriodGranularity rules, same as the SQL TIME_FLOOR family):
    *  - explicit `origin` → instant-space `(t − o) mod w` anchoring, which
    *    is timezone-INVARIANT (tz only shifts the DEFAULT origin, and an
    *    explicit one overrides it) — fixed-width periods only, loud
    *    otherwise;
    *  - `timeZone` without origin → truncate in the zone's wall clock
    *    (from_utc → truncate → to_utc sandwich), results stay UTC instants;
    *  - neither → the identical plan to before. */
  private def truncateInZone(g: Granularity, tz: Option[String],
      origin: Option[Long] = scala.None)(c: Column): Column =
    origin match {
      case Some(o) =>
        require(g.widthSeconds > 0,
          "granularity origin needs a fixed-width period (calendar periods " +
            "have no origin semantics)")
        val w = g.widthSeconds * 1000L
        val x = unix_millis(c)
        timestamp_millis(x - pmod(x - lit(o), lit(w)))
      case scala.None => tz match {
        case scala.None => g.truncate(c)
        case Some(z) => to_utc_timestamp(g.truncate(from_utc_timestamp(c, z)), z)
      }
    }

  // ------------------------------------------------------------- aggregation

  /** Shared core of timeseries/topN/groupBy: bucket __time, group by
    * (bucket, dims), apply aggs + postAggs. `subtotals` (groupBy's
    * subtotalsSpec) switches the single grouping to GROUPING SETS — Druid
    * runs the query once per subtotal dim-list and concatenates, with dims
    * outside a list nulled; Spark's grouping-sets operator IS that plan in
    * one pass (each set shares the shuffle; the time bucket belongs to
    * every set, as Druid's per-run bucketing does).
    */
  private def aggregate(df: DataFrame, root: JsonNode,
      dims: Seq[(String, Column)],
      subtotals: Option[Seq[Seq[String]]] = None): DataFrame = {
    val aggSpecs = opt(root, "aggregations").toSeq.flatMap(_.elements.asScala)
      .map(SpecLoader.parseAgg)
      // filtered-agg filters see the RAW event time, not the bucket below
      .map(Aggregators.remapFilterTime(_, TimeCol, Pipeline.RawTsCol)).toSeq
    val aggs = aggSpecs.map(Aggregators.toColumn(_, Some(filterColumn))) match {
      case Nil => Seq(count(lit(1)).as("rows"))
      case xs  => xs
    }
    graft.functions.GraftFunctions.register(df.sparkSession) // sketch aggs
    val bucketed = df
      // keep the raw event time visible to order-sensitive aggregators
      // (first/last family) — same convention as Pipeline.rollup
      .withColumn(Pipeline.RawTsCol, col(TimeCol))
      .withColumn(TimeCol,
        truncateInZone(granularity(root), granularityZone(root),
          granularityOrigin(root))(col(TimeCol)))
    val grouped = subtotals match {
      case None =>
        val keys = col(TimeCol) +: dims.map { case (n, c) => c.as(n) }
        bucketed.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      case Some(sets) =>
        val dimNames = dims.map(_._1)
        sets.foreach(s => s.foreach(d => require(dimNames.contains(d),
          s"subtotalsSpec dimension '$d' is not in dimensions $dimNames")))
        // materialize computed dims under RESERVED temp names — writing the
        // output name directly would clobber a same-named input column the
        // aggregators still need (e.g. an extraction dim shadowing the
        // metric it reads); rename back after the aggregation
        val tmp = dimNames.map(n => n -> s"__subtotal_$n").toMap
        val withDims = dims.foldLeft(bucketed) { case (d, (n, c)) =>
          d.withColumn(tmp(n), c) }
        val grouped0 = withDims.groupingSets(
          sets.map(s => col(TimeCol) +: s.map(n => col(tmp(n)))).toList,
          (col(TimeCol) +: dimNames.map(n => col(tmp(n)))): _*)
          .agg(aggs.head, aggs.tail: _*)
        dimNames.foldLeft(grouped0)((d, n) => d.withColumnRenamed(tmp(n), n))
    }
    applyPostAggs(grouped, root)
  }

  /** Response-time finalization (Druid's default `finalize=true`): struct
    * partials (doubleMean, first/last) unwrap to their finalized value and
    * sketch binaries (thetaSketch, hllSketch) become estimates AFTER the
    * post-aggs ran over the raw aggregator output (fieldAccess sees
    * partials, finalizingFieldAccess / the sketch finalizer post-aggs see
    * through them — the Druid evaluation order) and after the dense-bucket
    * zero-fill re-applied them, so each query path calls this LAST.
    * `context.finalize=false` keeps the raw partials (the sketch-download
    * idiom). histogramSketch binaries stay binary either way, like Druid's
    * quantiles sketch whose finalized form IS the sketch. */
  private def finalizeAggs(df: DataFrame, root: JsonNode): DataFrame = {
    val finalize = opt(root, "context").flatMap(c => opt(c, "finalize"))
      .forall(_.asBoolean(true))
    if (!finalize) df
    else finalizeAggs(df,
      opt(root, "aggregations").toSeq.flatMap(_.elements.asScala)
        .map(SpecLoader.parseAgg).toSeq)
  }

  private def finalizeAggs(df: DataFrame,
      aggSpecs: Seq[graft.config.AggregatorSpec]): DataFrame =
    aggSpecs.foldLeft(df) { (d, a) =>
      def f = graft.pipeline.Cols.exact(a.name)
      a.aggType match {
        case "doubleMean" =>
          d.withColumn(a.name, f.getField("s") / f.getField("c"))
        case "doubleFirst" | "doubleLast" | "longFirst" | "longLast" |
             "stringFirst" | "stringLast" =>
          d.withColumn(a.name, f.getField("v"))
        case "thetaSketch" =>
          d.withColumn(a.name,
            org.apache.spark.sql.graft.GraftSqlBridge.column(
              graft.functions.ThetaEstimate(
                org.apache.spark.sql.graft.GraftSqlBridge.expression(f))))
        case "arrayOfDoublesSketch" =>
          d.withColumn(a.name,
            org.apache.spark.sql.graft.GraftSqlBridge.column(
              graft.functions.TupleEstimate(
                org.apache.spark.sql.graft.GraftSqlBridge.expression(f))))
        case "hllSketch" =>
          d.withColumn(a.name, hll_sketch_estimate(f).cast("double"))
        case "filtered" =>
          // finalize by the delegate's type under the wrapper's name
          a.aggregator.map(del => finalizeAggs(d, Seq(del.copy(name = a.name))))
            .getOrElse(d)
        case _ => d
      }
    }

  /** postAggregations over a frame that already carries the aggregator
    * columns. Applied once inside [[aggregate]] and RE-applied after the
    * dense-bucket zero-fill ([[zeroFill]]): a left join leaves postAgg
    * columns NULL on empty buckets, but Druid computes postAggs over the
    * zeroed aggregates — recomputing over the coalesced columns restores
    * that (order matters: later postAggs may read earlier ones). */
  private def applyPostAggs(df: DataFrame, root: JsonNode): DataFrame = {
    // aggregator name → effective aggType (filtered wrappers resolve to
    // their delegate) so finalizer post-aggs know what they read
    def effType(a: graft.config.AggregatorSpec): String =
      if (a.aggType == "filtered") a.aggregator.map(effType).getOrElse("filtered")
      else a.aggType
    val aggTypes = opt(root, "aggregations").toSeq.flatMap(_.elements.asScala)
      .map(SpecLoader.parseAgg).map(a => a.name -> effType(a)).toMap
    opt(root, "postAggregations").toSeq.flatMap(_.elements.asScala)
      .map(SpecLoader.parsePostAgg)
      .foldLeft(df)((d, p) =>
        d.withColumn(p.name, Aggregators.postAggColumn(p, aggTypes)))
  }

  // -------------------------------------------------------------- timeseries

  /** timeseries = the shared aggregate core, plus upstream's empty-bucket
    * contract: with `context.skipEmptyBuckets=false` (Druid's DEFAULT —
    * buckets with no rows are emitted with identity aggregates), the
    * query's intervals generate a dense bucket frame in-plan and missing
    * buckets zero-fill sums/counts (other aggregates stay null, matching
    * the identity Druid renders for them; postAggs recompute over the
    * zeroed columns).
    *
    * Default handling matches Druid WHEN the dense frame is derivable:
    * absent skipEmptyBuckets + intervals + a fixed-width granularity →
    * emit empties, like upstream. Without intervals or with a calendar/all
    * granularity there is no finite bucket frame to generate, so the
    * default falls back to sparse output; EXPLICIT skipEmptyBuckets=false
    * in that position stays a loud error rather than a silent skip.
    */
  private def timeseries(df: DataFrame, root: JsonNode): DataFrame = {
    val grouped = aggregate(df, root, Nil)
    // dense output needs a finite bucket frame: a top-level intervals
    // clause plus a bucketing granularity. Fixed-width, calendar, ZONED
    // and origin-anchored granularities all enumerate (bucketFrame), so
    // Druid's dense default applies to every derivable shape; only a
    // frameless query (no intervals, or granularity all/none) falls back
    // to sparse — EXPLICIT skipEmptyBuckets=false there stays a loud
    // error rather than a silent skip.
    val g0 = granularity(root)
    val denseDerivable = intervalMillis(root).nonEmpty &&
      g0 != Granularity.All && g0 != Granularity.None
    val skipEmpty = opt(root, "context").flatMap(c => opt(c, "skipEmptyBuckets"))
      .map(_.asBoolean)
      .getOrElse(!denseDerivable)
    val base = if (skipEmpty) finalizeAggs(grouped, root)
    else finalizeAggs({
      val gran = granularity(root)
      require(gran != Granularity.All && gran != Granularity.None,
        "skipEmptyBuckets=false needs a bucketing granularity")
      val intervals = intervalMillis(root)
      require(intervals.nonEmpty, "skipEmptyBuckets=false needs intervals")
      val buckets = bucketFrame(df.sparkSession, intervals, gran,
        granularityZone(root), granularityOrigin(root))
      // presence marker: zero-fill must hit only JOIN-MISS buckets — a
      // present bucket whose sum is legitimately null (every input value
      // null) keeps its null; a bare coalesce over the agg column cannot
      // tell the two apart (NativeSqlFuzzSpec regression)
      val joined = buckets.join(
        grouped.withColumn(PresentCol, lit(true)), Seq(TimeCol), "left")
      zeroFill(joined, root, grouped).drop(PresentCol)
    }, root)
    // context.grandTotal (Druid timeseries): append ONE null-timestamped
    // row RE-AGGREGATED from the filtered+clipped input (never a re-sum of
    // finalized per-bucket values — a grand-total mean/sketch must merge
    // partials, Druid's rule), post-aggs and finalization applied on top
    val grandTotal = opt(root, "context").flatMap(c => opt(c, "grandTotal"))
      .exists(_.asBoolean)
    // Druid's timeseries envelope is TIME-ORDERED — ascending unless the
    // query sets "descending": true. Bucket counts are small
    // (intervals/width), so the final sort is negligible; Catalyst's
    // EliminateSorts drops it when a wrapping query dataSource
    // re-aggregates.
    def timeOrder(d: DataFrame): DataFrame =
      if (opt(root, "descending").exists(_.asBoolean))
        d.orderBy(col(TimeCol).desc_nulls_last)
      else d.orderBy(col(TimeCol).asc_nulls_last)
    // Druid timeseries `limit`: first N BUCKETS in the envelope's order —
    // applied before the grandTotal union, because Druid appends the
    // null-stamped total row AFTER limiting (limit+grandTotal returns
    // N buckets + the total, never N-1 buckets)
    val limited = opt(root, "limit").map(_.asInt)
      .map(timeOrder(base).limit).getOrElse(base)
    if (!grandTotal) timeOrder(limited)
    else timeOrder(limited.unionByName(
      finalizeAggs(aggregateAll(df, root), root)))
  }

  /** One-row whole-input aggregation for `grandTotal`: same aggregators and
    * post-aggs as [[aggregate]], no time bucketing; `__time` is null (the
    * rendering Druid gives the grand-total entry). The raw event time is
    * captured BEFORE nulling so the first/last family still orders. */
  private def aggregateAll(df: DataFrame, root: JsonNode): DataFrame = {
    val aggSpecs = opt(root, "aggregations").toSeq.flatMap(_.elements.asScala)
      .map(SpecLoader.parseAgg)
      // same raw-time rule as [[aggregate]]: __time is nulled below
      .map(Aggregators.remapFilterTime(_, TimeCol, Pipeline.RawTsCol)).toSeq
    val aggs = aggSpecs.map(Aggregators.toColumn(_, Some(filterColumn))) match {
      case Nil => Seq(count(lit(1)).as("rows"))
      case xs  => xs
    }
    graft.functions.GraftFunctions.register(df.sparkSession)
    val prepared = df
      .withColumn(Pipeline.RawTsCol, col(TimeCol))
      .withColumn(TimeCol,
        lit(null).cast(org.apache.spark.sql.types.TimestampType))
    val grouped = prepared.groupBy(col(TimeCol)).agg(aggs.head, aggs.tail: _*)
    applyPostAggs(grouped, root)
  }

  /** Dense in-plan bucket frame covering `intervals` at `gran` (first
    * bucket = truncated interval start). Shared by the dense-timeseries and
    * movingAverage paths.
    */
  private def bucketFrame(spark: org.apache.spark.sql.SparkSession,
      intervals: Seq[(Long, Long)], gran: Granularity,
      tz: Option[String] = scala.None,
      origin: Option[Long] = scala.None): DataFrame = (origin, tz) match {
    // explicit origin: instant-space o + k·w anchoring — the exact twin of
    // truncateInZone's origin rule (which already rejects calendar periods)
    case (Some(o), _) =>
      val widthMs = gran.widthSeconds * 1000L
      intervals.map { case (s, e) =>
        require(e > s, "empty interval")
        val first = o + Math.floorDiv(s - o, widthMs) * widthMs
        val last = o + Math.floorDiv(e - 1 - o, widthMs) * widthMs
        spark.range(1).select(explode(sequence(
          timestamp_millis(lit(first)), timestamp_millis(lit(last)),
          expr(s"interval ${gran.widthSeconds} second"))).as(TimeCol))
      }.reduce(_ unionAll _).distinct()
    // plain fixed width, no zone: in-plan sequence, no driver enumeration
    case (scala.None, scala.None) if gran.widthSeconds > 0 =>
      val widthMs = gran.widthSeconds * 1000L
      intervals.map { case (s, e) =>
        require(e > s, "empty interval")
        val first = Math.floorDiv(s, widthMs) * widthMs
        val last = Math.floorDiv(e - 1, widthMs) * widthMs
        spark.range(1).select(explode(sequence(
          timestamp_millis(lit(first)), timestamp_millis(lit(last)),
          expr(s"interval ${gran.widthSeconds} second"))).as(TimeCol))
      }.reduce(_ unionAll _).distinct()
    // zoned granularity (fixed-width or calendar), or a calendar
    // granularity in UTC: wall-clock enumeration
    case (scala.None, z) =>
      wallClockFrame(spark, intervals, gran, z.getOrElse("UTC"))
  }

  /** Dense frame for zoned / calendar granularities: bucket LABELS are
    * enumerated on the driver in WALL-CLOCK space (the space where
    * PeriodGranularity buckets are equal-stepped — one label per local
    * day/hour/month), then mapped to instants with the SAME
    * `to_utc_timestamp` Column the row-side sandwich uses, so the frame
    * and the row buckets agree bit-for-bit even at DST edges (a
    * spring-forward gap label lands on the same resolved instant as its
    * shifted rows; duplicates collapse in the distinct). Driver state is
    * one label per bucket — bounded by interval/width and capped loudly. */
  private def wallClockFrame(spark: org.apache.spark.sql.SparkSession,
      intervals: Seq[(Long, Long)], gran: Granularity, z: String): DataFrame = {
    val zone = java.time.ZoneId.of(z)
    val labels = scala.collection.mutable.LinkedHashSet.empty[Long]
    intervals.foreach { case (s, e) =>
      require(e > s, "empty interval")
      var l = wallTrunc(gran, java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(s), zone))
      // java's gap/overlap resolution only steers the LOOP BOUND; the
      // emitted instant comes from Spark's own conversion below
      while (l.atZone(zone).toInstant.toEpochMilli < e) {
        require(labels.size < 200000,
          "dense zero-fill frame exceeds 200k buckets — narrow the " +
            "intervals or coarsen the granularity")
        labels += l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000L
        l = wallStep(gran, l, 1)
      }
    }
    import spark.implicits._
    labels.toSeq.toDF("__wall")
      .select(to_utc_timestamp(timestamp_millis(col("__wall")), z).as(TimeCol))
      .distinct()
  }

  /** Wall-clock twins of the bucket truncate/step, shared by the dense
    * frames and movingAverage's window math. Fixed widths floor the
    * UTC-LABELED wall value in epoch space; calendar units reuse the
    * driver-side calendar truncation — both exactly the row-side
    * `g.truncate(from_utc_timestamp(..))` semantics under a UTC session. */
  private def wallTrunc(gran: Granularity,
      l: java.time.LocalDateTime): java.time.LocalDateTime =
    if (gran.widthSeconds > 0) {
      val e = l.toEpochSecond(java.time.ZoneOffset.UTC)
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(e, gran.widthSeconds) * gran.widthSeconds, 0,
        java.time.ZoneOffset.UTC)
    } else java.time.LocalDateTime.ofInstant(
      gran.truncateInstant(l.toInstant(java.time.ZoneOffset.UTC),
        java.time.ZoneOffset.UTC), java.time.ZoneOffset.UTC)

  private def wallStep(gran: Granularity, l: java.time.LocalDateTime,
      n: Long): java.time.LocalDateTime =
    if (gran.widthSeconds > 0) l.plusSeconds(gran.widthSeconds * n)
    else gran.truncUnit match {
      case "week"    => l.plusWeeks(n)
      case "month"   => l.plusMonths(n)
      case "quarter" => l.plusMonths(3 * n)
      case "year"    => l.plusYears(n)
    }

  /** Instant (millis) of the start of the bucket containing `ms` under the
    * full granularity object form, stepped back `back` whole buckets —
    * movingAverage's backward window extension and first-emitted-bucket. */
  private def bucketStartMs(gran: Granularity, tz: Option[String],
      origin: Option[Long], ms: Long, back: Long = 0): Long = (origin, tz) match {
    case (Some(o), _) =>
      val w = gran.widthSeconds * 1000L
      o + Math.floorDiv(ms - o, w) * w - back * w
    case (scala.None, scala.None) if gran.widthSeconds > 0 =>
      val w = gran.widthSeconds * 1000L
      Math.floorDiv(ms, w) * w - back * w
    case (scala.None, z) =>
      val zone = java.time.ZoneId.of(z.getOrElse("UTC"))
      val l0 = wallTrunc(gran, java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ms), zone))
      wallStep(gran, l0, -back).atZone(zone).toInstant.toEpochMilli
  }

  /** Aggregator names whose empty-bucket identity is ZERO: counts and sums,
    * reaching through `filtered` wrappers to the delegate's type (a
    * filtered count is still a count). Everything else (min/max, first/
    * last, sketches) keeps null — the identity Druid renders for no data.
    */
  private def zeroableNames(root: JsonNode): Seq[String] = {
    def effective(a: graft.config.AggregatorSpec): String =
      if (a.aggType == "filtered") a.aggregator.map(effective).getOrElse("")
      else a.aggType
    val aggSpecs = opt(root, "aggregations").toSeq.flatMap(_.elements.asScala)
      .map(SpecLoader.parseAgg).toSeq
    aggSpecs.filter(a => Seq("count", "longSum", "doubleSum")
      .contains(effective(a))).map(_.name) ++
      (if (aggSpecs.isEmpty) Seq("rows") else Nil)
  }

  /** coalesce the zeroable aggregator outputs of `joined` to typed zeros,
    * then recompute postAggregations over the zeroed columns (Druid renders
    * postAggs on empty buckets from the identity aggregates — a left join
    * alone would leave them NULL). */
  private def zeroFill(joined: DataFrame, root: JsonNode,
      typed: DataFrame): DataFrame = {
    val types = typed.schema.fields.map(f => f.name -> f.dataType).toMap
    val zeroed = zeroableNames(root).foldLeft(joined)((d, n) =>
      d.withColumn(n, when(col(PresentCol).isNull, lit(0).cast(types(n)))
        .otherwise(col(n))))
    applyPostAggs(zeroed, root)
  }

  /** Join-side marker for the dense-timeseries fill — see [[timeseries]]. */
  private val PresentCol = "__graft_bucket_present"

  // ------------------------------------------------------------------- topN

  private def topN(df: DataFrame, root: JsonNode): DataFrame = {
    val (name, dcol) = dimensionSpec(opt(root, "dimension").getOrElse(
      throw new IllegalArgumentException("topN needs a dimension")),
      Some(df.schema))
    val threshold = opt(root, "threshold").map(_.asInt).getOrElse(
      throw new IllegalArgumentException("topN needs a threshold"))
    // finalize BEFORE ordering: Druid's topN metric compares finalized
    // values (a struct/binary partial has no metric order)
    val grouped = finalizeAggs(aggregate(df, root, Seq(name -> dcol)), root)
    val metricNode = opt(root, "metric").getOrElse(
      throw new IllegalArgumentException("topN needs a metric"))
    val ordering = topNOrdering(metricNode, name)
    // dimension-spec pagination: `previousStop` resumes strictly after the
    // given value in the spec's own collation (before / below it when the
    // spec is inverted) — Druid's lexicographic-topN paging knob
    val paged = previousStopFilter(metricNode, name, inverted = false)
      .map(grouped.filter).getOrElse(grouped)
    val w = Window.partitionBy(col(TimeCol)).orderBy(ordering: _*)
    paged.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= threshold).drop("__rank")
  }

  private def previousStopFilter(m: JsonNode, dim: String,
      inverted: Boolean): Option[Column] =
    if (m.isTextual) scala.None
    else str(m, "type", "") match {
      case "inverted" => opt(m, "metric")
        .flatMap(previousStopFilter(_, dim, !inverted))
      case "dimension" | "lexicographic" =>
        opt(m, "previousStop").filterNot(_.isNull).map(_.asText).map { ps =>
          val ord = str(m, "ordering", "lexicographic")
          val l = dimOrderKeys(col(dim), ord)
          val r = dimOrderKeys(lit(ps), ord)
          // multi-key orderings (strlen) compare as a struct tuple
          val (lk, rk) =
            if (l.size == 1) (l.head, r.head)
            else (struct(l: _*), struct(r: _*))
          if (inverted) lk < rk else lk > rk
        }
      case _ => scala.None
    }

  /** Druid topN metric spec → deterministic ordering (dimension ascending
    * breaks metric ties — Druid leaves ties unspecified). `inverted` flips
    * the inner metric's direction (double inversion cancels). */
  private def topNOrdering(m: JsonNode, dim: String,
      inverted: Boolean = false): Seq[Column] = {
    def metricOrder(name: String): Seq[Column] =
      Seq(if (inverted) col(name).asc else col(name).desc, col(dim).asc)
    if (m.isTextual) metricOrder(m.asText)
    else str(m, "type", "") match {
      case "numeric" => metricOrder(str(m, "metric", ""))
      case "inverted" =>
        topNOrdering(opt(m, "metric").getOrElse(
          throw new IllegalArgumentException("inverted metric needs a metric")),
          dim, !inverted)
      case "dimension" | "lexicographic" =>
        // Druid DimensionTopNMetricSpec `ordering`: lexicographic (default)
        // / alphanumeric (digit-run collation via the order-preserving
        // [[graft.functions.AlphanumericKey]]) / numeric / strlen
        val keys = dimOrderKeys(col(dim), str(m, "ordering", "lexicographic"))
        keys.map(k => if (inverted) k.desc else k.asc)
      case other => throw new IllegalArgumentException(
        s"unsupported topN metric type '$other' (numeric/inverted/dimension)")
    }
  }

  /** True when a DateTimeFormatter pattern contains a zone/offset letter
    * (z/Z/x/X/V/O) OUTSIDE single-quoted literals. */
  private def hasZonePattern(fmt: String): Boolean = {
    var inQuote = false
    var i = 0
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (ch == '\'') inQuote = !inQuote
      else if (!inQuote && "zZxXVO".indexOf(ch.toInt) >= 0) return true
      i += 1
    }
    false
  }

  /** Druid's dimension-ordering names → sort key columns (several for
    * strlen: length, then value). Shared by topN dimension specs, limitSpec
    * `dimensionOrder`, and the search `sort` spec. */
  private def dimOrderKeys(c: Column, ordering: String): Seq[Column] =
    ordering match {
      case "lexicographic" => Seq(c.cast(StringType))
      case "alphanumeric" =>
        Seq(org.apache.spark.sql.graft.GraftSqlBridge.column(
          graft.functions.AlphanumericKey(
            org.apache.spark.sql.graft.GraftSqlBridge.expression(
              c.cast(StringType)))))
      case "numeric" => Seq(c.try_cast(DoubleType))
      case "strlen" => Seq(length(c.cast(StringType)), c.cast(StringType))
      case other => throw new IllegalArgumentException(
        s"unsupported dimension ordering '$other' " +
          "(lexicographic/alphanumeric/numeric/strlen)")
    }

  // ----------------------------------------------------------------- groupBy

  private def groupBy(df: DataFrame, root: JsonNode): DataFrame = {
    val dims = opt(root, "dimensions").toSeq.flatMap(_.elements.asScala)
      .map(dimensionSpec(_, Some(df.schema))).toSeq
    val subtotals = opt(root, "subtotalsSpec").map(_.elements.asScala
      .map(s => s.elements.asScala.map(_.asText).toSeq).toSeq)
    // finalize BEFORE having/limit: Druid's having and metric-ordered
    // limitSpec compare finalized metric values
    val grouped = finalizeAggs(aggregate(df, root, dims, subtotals), root)
    val having = opt(root, "having").map(havingColumn)
      .map(grouped.filter).getOrElse(grouped)
    opt(root, "limitSpec").map(limited(having, _)).getOrElse(having)
  }

  /** Druid having spec: numeric comparisons on aggregated metrics +
    * and/or/not composition + `filter` (the query filter DSL over dimension
    * OUTPUT values — so extraction-fn outputs are filterable too). */
  private def havingColumn(n: JsonNode): Column = str(n, "type", "") match {
    case "greaterThan" => col(str(n, "aggregation", "")) > havingValue(n)
    case "lessThan"    => col(str(n, "aggregation", "")) < havingValue(n)
    case "equalTo"     => col(str(n, "aggregation", "")) === havingValue(n)
    case "and" => havingSpecs(n).map(havingColumn).reduceOption(_ && _)
      .getOrElse(throw new IllegalArgumentException("and having needs havingSpecs"))
    case "or" => havingSpecs(n).map(havingColumn).reduceOption(_ || _)
      .getOrElse(throw new IllegalArgumentException("or having needs havingSpecs"))
    case "not" => !havingColumn(opt(n, "havingSpec").getOrElse(
      throw new IllegalArgumentException("not having needs a havingSpec")))
    case "filter" => Filters.toColumn(SpecLoader.parseFilter(
      opt(n, "filter").getOrElse(
        throw new IllegalArgumentException("filter having needs a filter"))))
    // dimension OUTPUT equality (upstream DimensionSelectorHavingSpec),
    // over the grouped dim column — optionally through an extractionFn
    // (Druid supports one); an explicit null value matches NULL dimension
    // rows, the upstream null-selector semantics
    case "dimSelector" =>
      val base = col(str(n, "dimension", ""))
      val c = opt(n, "extractionFn").map(extraction(base, _)).getOrElse(base)
        .cast(StringType)
      opt(n, "value") match {
        case scala.None => throw new IllegalArgumentException(
          "dimSelector having needs a value")
        case Some(v) if v.isNull => c.isNull
        case Some(v) => c <=> lit(v.asText)
      }
    case other => throw new IllegalArgumentException(
      s"unsupported having type '$other' " +
        "(greaterThan/lessThan/equalTo/dimSelector/and/or/not/filter)")
  }

  private def havingValue(n: JsonNode): Column =
    lit(opt(n, "value").map(_.asDouble).getOrElse(
      throw new IllegalArgumentException(s"having needs a value: $n")))

  private def havingSpecs(n: JsonNode): Seq[JsonNode] =
    opt(n, "havingSpecs").toSeq.flatMap(_.elements.asScala).toSeq

  /** limitSpec → global orderBy(columns…, then grouping keys as tiebreak) +
    * offset/limit. The tiebreak makes pagination deterministic (Druid's own
    * default limitSpec ordering is the grouping key list); with a limit the
    * plan is TakeOrderedAndProject — no global sort materializes. */
  private def limited(df: DataFrame, n: JsonNode): DataFrame = {
    require(str(n, "type", "default") == "default",
      s"unsupported limitSpec type '${str(n, "type", "")}'")
    val explicit: Seq[(String, Seq[Column])] =
      opt(n, "columns").toSeq.flatMap(_.elements.asScala).map { c =>
        if (c.isTextual) c.asText -> Seq(col(c.asText).asc)
        else {
          val d = str(c, "dimension", "")
          val desc = str(c, "direction", "ascending")
            .toLowerCase.startsWith("desc")
          // Druid OrderByColumnSpec `dimensionOrder`: lexicographic (the
          // spec default for string columns) / alphanumeric / numeric /
          // strlen. Absent = the column's own type order (metric columns
          // sort numerically — forcing the string default would break
          // metric-ordered limitSpecs).
          val keys = opt(c, "dimensionOrder") match {
            case Some(o) =>
              dimOrderKeys(col(d),
                if (o.isTextual) o.asText else str(o, "type", "lexicographic"))
            case scala.None => Seq(col(d))
          }
          d -> keys.map(k => if (desc) k.desc else k.asc)
        }
      }.toSeq
    val named = explicit.map(_._1).toSet
    val tiebreak = df.columns.filterNot(named).map(col(_).asc).toSeq
    val ordered = df.orderBy(explicit.flatMap(_._2) ++ tiebreak: _*)
    val offset = opt(n, "offset").map(_.asInt).getOrElse(0)
    val shifted = if (offset > 0) ordered.offset(offset) else ordered
    opt(n, "limit").map(_.asInt).map(shifted.limit).getOrElse(shifted)
  }

  // ----------------------------------------------------- dimensions / fns

  /** A dimension reference to `__time` must see the RAW event time, not the
    * granularity bucket (Druid's rule — e.g. a timeFormat extraction
    * bucketing by hour-of-day under granularity `all`). [[aggregate]]
    * preserves it as [[Pipeline.RawTsCol]] before overwriting the bucket. */
  private def dimCol(name: String): Column =
    if (name == TimeCol) col(Pipeline.RawTsCol) else col(name)

  /** dimensionSpec: plain string | default | extraction (substring / upper /
    * lower / regex / timeFormat / strlen). Output name defaults to the
    * dimension name. */
  private def dimensionSpec(n: JsonNode): (String, Column) =
    dimensionSpec(n, scala.None)

  private def dimensionSpec(n: JsonNode,
      schema: Option[org.apache.spark.sql.types.StructType]): (String, Column) =
    if (n.isTextual) n.asText -> dimCol(n.asText)
    else {
      val d = str(n, "dimension", "")
      val out = str(n, "outputName", d)
      str(n, "type", "default") match {
        case "default" =>
          require(d.nonEmpty, s"dimensionSpec needs a dimension: $n")
          out -> dimCol(d)
        case "extraction" =>
          require(d.nonEmpty, s"dimensionSpec needs a dimension: $n")
          out -> extraction(dimCol(d), opt(n, "extractionFn").getOrElse(
            throw new IllegalArgumentException(
              "extraction dimensionSpec needs an extractionFn")))
        // multi-value value filters (Druid listFiltered / regexFiltered):
        // drop array ELEMENTS before grouping. The filtered array then
        // groups with this engine's documented MV SET semantics (one row
        // per distinct array) — per-value row fan-out is the `unnest`
        // dataSource's job, as in modern Druid.
        case t @ ("listFiltered" | "regexFiltered") =>
          val delNode = opt(n, "delegate").getOrElse(
            throw new IllegalArgumentException(s"$t dimensionSpec needs a delegate"))
          val delegate = dimensionSpec(delNode, schema)
          val outName = if (str(n, "outputName", "").nonEmpty) out else delegate._1
          val pred: Column => Column =
            if (t == "listFiltered") {
              val values = opt(n, "values").toSeq
                .flatMap(_.elements.asScala).map(_.asText)
              require(values.nonEmpty, "listFiltered needs values")
              // explicit null isWhitelist = the default TRUE (Druid's
              // Boolean deserialization), never a silent blacklist flip
              val white = opt(n, "isWhitelist").filterNot(_.isNull)
                .forall(_.asBoolean)
              x => if (white) x.isin(values: _*)
                   else !coalesce(x.isin(values: _*), lit(false))
            } else {
              val p = str(n, "pattern", "")
              require(p.nonEmpty, "regexFiltered needs a pattern")
              // Druid's RegexFilteredDimensionSpec uses FULL-string
              // matches(), not substring find — anchor the pattern
              x => x.rlike("^(?:" + p + ")$")
            }
          // a SINGLE-VALUE delegate (plain non-array column, or any
          // extraction output) follows Druid's SV rule: the value
          // survives the filter or becomes null — functions.filter only
          // types against arrays. Unknown schema defaults to the MV form.
          val delegateIsArray = {
            val plainDim =
              if (delNode.isTextual) Some(delNode.asText)
              else if (str(delNode, "type", "default") == "default")
                Some(str(delNode, "dimension", ""))
              else scala.None // extraction outputs are strings
            plainDim match {
              case Some(d) => schema.forall(_.fields.exists(f =>
                f.name == d &&
                  f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
              case scala.None => false
            }
          }
          outName -> (
            if (delegateIsArray) filter(delegate._2, pred)
            else when(pred(delegate._2.cast(StringType)), delegate._2)
              .otherwise(lit(null)))
        case other => throw new IllegalArgumentException(
          s"unsupported dimensionSpec type '$other' " +
            "(default/extraction/listFiltered/regexFiltered)")
      }
    }

  private def extraction(c: Column, fn: JsonNode): Column =
    str(fn, "type", "") match {
      case "substring" =>
        // Druid index is 0-based, Spark's is 1-based; absent length = to end
        val start = opt(fn, "index").map(_.asInt).getOrElse(0)
        val len = opt(fn, "length").map(_.asInt).getOrElse(Int.MaxValue)
        substring(c.cast(StringType), start + 1, len)
      case "upper" => upper(c.cast(StringType))
      case "lower" => lower(c.cast(StringType))
      case "strlen" => length(c.cast(StringType)).cast(StringType)
      case "regex" =>
        // group 1 when the pattern declares one, else the whole match —
        // Druid's rule; non-matches keep the input unless replaceMissingValue
        val pattern = str(fn, "expr", "")
        require(pattern.nonEmpty, "regex extractionFn needs expr")
        val group =
          if (java.util.regex.Pattern.compile(pattern).matcher("").groupCount() > 0) 1
          else 0
        val s0 = c.cast(StringType)
        val extracted = regexp_extract(s0, pattern, group)
        val onMiss =
          if (opt(fn, "replaceMissingValue").exists(_.asBoolean))
            opt(fn, "replaceMissingValueWith").map(v => lit(v.asText))
              .getOrElse(lit(null).cast(StringType))
          else s0
        // match/miss decided by an RLike GATE, not by the extracted text
        // being non-empty — a pattern matching with an EMPTY capture group
        // must emit the empty capture, never the miss fallback (review
        // finding r7; the SQL dialect's regexp_extract override already
        // uses this gate)
        when(s0.isNotNull && s0.rlike(pattern), extracted).otherwise(onMiss)
      // upstream TimeFormatExtractionFn: `format` + `timeZone` (the
      // formatting AND bucketing calendar) + `granularity` (bucket the
      // instant BEFORE formatting — named or object form, object-form
      // timeZone/origin win over the fn-level zone) + `asMillis` (epoch-
      // millis output) + `locale` (r10: a dedicated zone-aware
      // [[graft.functions.LocaleDateFormat]] expression — Spark's
      // date_format has no locale seam, and a silently-English month name
      // is the silent-shift class this engine bans, so until r10 the key
      // was a loud reject). Absent format keeps the engine's
      // seconds-precision ISO default (documented delta: upstream's null
      // format also renders the zone offset).
      case "timeFormat" =>
        val tzName = str(fn, "timeZone", "UTC")
        require(scala.util.Try(java.time.ZoneId.of(tzName)).isSuccess,
          s"timeFormat: unknown timeZone '$tzName'")
        val fnZone = Some(tzName).filterNot { z =>
          val rules = java.time.ZoneId.of(z).getRules
          rules.isFixedOffset && rules.getOffset(java.time.Instant.EPOCH) ==
            java.time.ZoneOffset.UTC
        }
        val g = granularity(fn)
        val tcol = c.cast("timestamp")
        val bucketed =
          if (g == Granularity.All) tcol
          else truncateInZone(g, granularityZone(fn).orElse(fnZone),
            granularityOrigin(fn))(tcol)
        if (opt(fn, "asMillis").exists(_.asBoolean)) {
          require(opt(fn, "format").isEmpty,
            "timeFormat: asMillis and format are mutually exclusive " +
              "(upstream ignores format when asMillis is set; set one)")
          require(opt(fn, "locale").isEmpty,
            "timeFormat: locale is meaningless with asMillis (epoch-millis " +
              "output has no locale); drop one")
          unix_millis(bucketed).cast(StringType)
        } else opt(fn, "locale").map(_.asText) match {
          case Some(loc) =>
            // locale path: a real zone-aware java.time formatter (the
            // formatter renders the instant IN tzName), so unlike the
            // rebase path below, zone patterns are legal and correct here
            val fmt = str(fn, "format", "yyyy-MM-dd'T'HH:mm:ss")
            org.apache.spark.sql.graft.GraftSqlBridge.column(
              graft.functions.LocaleDateFormat(
                org.apache.spark.sql.graft.GraftSqlBridge.expression(bucketed),
                fmt, loc, tzName))
          case scala.None =>
          val fmt = str(fn, "format", "yyyy-MM-dd'T'HH:mm:ss")
          // the zone shift is a from_utc_timestamp REBASE, so a zone
          // PATTERN in the format would render the session zone's name
          // against the requested zone's wall clock — silently wrong,
          // so loud (quoted literals like 'Z' are fine)
          require(fnZone.isEmpty || !hasZonePattern(fmt),
            s"timeFormat: zone patterns (z/Z/x/X/V/O) in format '$fmt' " +
              "with a non-UTC timeZone would render the session zone, " +
              "not the requested one — drop the pattern or use UTC")
          val local = fnZone.map(z => from_utc_timestamp(bucketed, z))
            .getOrElse(bucketed)
          date_format(local, fmt)
        }
      case "lookup" | "registeredLookup" =>
        // inline map lookup (lookup type `map`) or a name from the
        // [[Lookups]] registry: either way a map literal keeps the
        // translation inside codegen — a lookup too big for a literal
        // belongs in a broadcast-join dim table (`lookup_map_dim` pattern)
        val mapping: Seq[(String, String)] =
          opt(fn, "lookup") match {
            case Some(l) if l.isTextual => // registeredLookup name form
              Lookups.get(l.asText).getOrElse(throw new IllegalArgumentException(
                s"lookup '${l.asText}' is not registered " +
                  s"(registered: ${Lookups.names.mkString(",")})")).toSeq
            case Some(l) if str(l, "type", "map") == "map" =>
              opt(l, "map").getOrElse(throw new IllegalArgumentException(
                  "lookup extractionFn needs lookup.type=map with a map"))
                .propertyStream.iterator.asScala.toSeq
                .map(e => e.getKey -> e.getValue.asText)
            case _ => throw new IllegalArgumentException(
              "lookup extractionFn needs lookup.type=map with a map, or a " +
                "registered lookup name")
          }
        require(mapping.nonEmpty, "lookup extractionFn map is empty")
        val pairs = mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
        val looked = element_at(map(pairs: _*), c.cast(StringType))
        val onMiss =
          if (opt(fn, "retainMissingValue").exists(_.asBoolean)) c.cast(StringType)
          else opt(fn, "replaceMissingValueWith").map(v => lit(v.asText))
            .getOrElse(lit(null).cast(StringType))
        coalesce(looked, onMiss)
      // chain of extraction fns, applied left to right (upstream
      // CascadeExtractionFn)
      case "cascade" =>
        val fns = opt(fn, "extractionFns").toSeq
          .flatMap(_.elements.asScala).toSeq
        require(fns.nonEmpty, "cascade extractionFn needs extractionFns")
        fns.foldLeft(c)(extraction)
      // java.util.Formatter over the dimension value (upstream
      // StringFormatExtractionFn); nullHandling picks what a NULL input
      // renders as — NULLSTRING (the word, Druid's default) / EMPTYSTRING
      // / RETURNNULL
      case "stringFormat" =>
        val f = str(fn, "format", "")
        require(f.nonEmpty, "stringFormat extractionFn needs a format")
        // format the RAW value (Druid's String.format over the object) so
        // numeric conversions like %d / %.1f work; only the NULL
        // replacement is a string, exactly what Druid substitutes
        val formatted = format_string(f, c)
        str(fn, "nullHandling", "NULLSTRING") match {
          case "NULLSTRING" =>
            when(c.isNull, format_string(f, lit("null"))).otherwise(formatted)
          case "EMPTYSTRING" =>
            when(c.isNull, format_string(f, lit(""))).otherwise(formatted)
          case "RETURNNULL" =>
            when(c.isNull, lit(null).cast(StringType)).otherwise(formatted)
          case other => throw new IllegalArgumentException(
            s"unsupported stringFormat nullHandling '$other' " +
              "(NULLSTRING/EMPTYSTRING/RETURNNULL)")
        }
      // numeric bucketing (upstream BucketExtractionFn): floor to
      // offset-anchored buckets of `size`, rendered as the bucket start
      case "bucket" =>
        val size = opt(fn, "size").map(_.asDouble).getOrElse(1.0)
        val off = opt(fn, "offset").map(_.asDouble).getOrElse(0.0)
        require(size > 0, s"bucket extractionFn size must be positive, got $size")
        val x = c.try_cast(DoubleType)
        (floor((x - lit(off)) / lit(size)) * lit(size) + lit(off))
          .cast(StringType)
      // retain values the regex FINDS a match in (find(), not full-match
      // — rlike's semantics), null out the rest (upstream
      // PartialDimExtractionFn)
      case "partial" =>
        val pattern = str(fn, "expr", "")
        require(pattern.nonEmpty, "partial extractionFn needs expr")
        val s0 = c.cast(StringType)
        when(s0.rlike(pattern), s0)
      // retain values the searchQuerySpec accepts, null out the rest
      // (upstream SearchQuerySpecDimExtractionFn) — same spec grammar as
      // the search queryType
      case "searchQuery" =>
        val q = opt(fn, "query").getOrElse(throw new IllegalArgumentException(
          "searchQuery extractionFn needs a query"))
        val s0 = c.cast(StringType)
        when(s0.isNotNull && searchMatcher(q)(s0), s0)
      // re-render a formatted time STRING: parse with timeFormat, emit with
      // resultFormat; a value the input format can't parse passes through
      // UNCHANGED — upstream TimeDimExtractionFn's documented fallback, and
      // why this needs try_to_timestamp under ANSI mode
      case "time" =>
        val inFmt = str(fn, "timeFormat", "")
        val outFmt = str(fn, "resultFormat", "")
        require(inFmt.nonEmpty && outFmt.nonEmpty,
          "time extractionFn needs timeFormat and resultFormat")
        val s0 = c.cast(StringType)
        val parsed = try_to_timestamp(s0, lit(inFmt))
        when(parsed.isNotNull, date_format(parsed, outFmt)).otherwise(s0)
      case other => throw new IllegalArgumentException(
        s"unsupported extractionFn type '$other' " +
          "(substring/upper/lower/strlen/regex/partial/searchQuery/time/" +
          "timeFormat/lookup/registeredLookup/cascade/stringFormat/bucket)")
    }

  // -------------------------------------------------------------------- scan

  private def scan(df: DataFrame, root: JsonNode): DataFrame = {
    val cols = opt(root, "columns").toSeq.flatMap(_.elements.asScala)
      .map(_.asText).toSeq
    val projected = if (cols.isEmpty) df else df.select(cols.map(col): _*)
    // Druid 26+ scan `orderBy`: arbitrary-column sort specs
    // [{"columnName": c, "order": "ascending|descending"}, …] — wins over
    // the legacy time-only `order` string when both appear (Druid rejects
    // the combination; the explicit form is strictly more expressive)
    val orderBySpecs = opt(root, "orderBy").toSeq
      .flatMap(_.elements.asScala).map { o =>
        val c = str(o, "columnName", "")
        require(c.nonEmpty, "scan orderBy entry needs a columnName")
        str(o, "order", "ascending").toLowerCase match {
          case "ascending"  => col(c).asc
          case "descending" => col(c).desc
          case other => throw new IllegalArgumentException(
            s"unsupported scan orderBy order '$other' (ascending/descending)")
        }
      }.toSeq
    val ordered =
      if (orderBySpecs.nonEmpty) {
        require(str(root, "order", "none").toLowerCase == "none",
          "scan takes either `orderBy` or the legacy time `order`, not both")
        projected.orderBy(orderBySpecs: _*)
      } else str(root, "order", "none").toLowerCase match {
        case "none"       => projected
        case "ascending"  => projected.orderBy(col(TimeCol).asc)
        case "descending" => projected.orderBy(col(TimeCol).desc)
        case other => throw new IllegalArgumentException(
          s"unsupported scan order '$other' (none/ascending/descending)")
      }
    val offset = opt(root, "offset").map(_.asInt).getOrElse(0)
    val shifted = if (offset > 0) ordered.offset(offset) else ordered
    opt(root, "limit").map(_.asInt).map(shifted.limit).getOrElse(shifted)
  }

  // ------------------------------------------------------------------ select

  /** The legacy `select` queryType (raw events + per-segment paging
    * offsets) — removed upstream in Druid 0.17, but every tranquility-era
    * deployment (Druid 0.9–0.12) queried through it, so migration needs it
    * to WORK, not to point at scan (upstream
    * `processing/.../select/SelectQuery.java`, pre-0.17 tree).
    *
    * Row shape: `segmentId`, `offset`, `__time`, then the requested
    * `dimensions` ++ `metrics` (both empty → every data column; the engine
    * reads a merged store view, so it cannot split dims from metrics on an
    * arbitrary frame — documented delta, same as scan's `columns`).
    * `segmentId` is the merged view's segment analog — `<ds>_<utc day>` of
    * the event, the same `datasource_start` naming as `sys.segments`.
    * `offset` is the row's position within its segment in scan direction
    * under THIS query's filter+intervals (upstream offsets are filtered
    * cursor positions, stable only across re-issues of the same query —
    * the identical contract here): ascending 0,1,2,…; descending −1,−2,…
    * (upstream's negative descending offsets). Ties on `__time` break on
    * every data column in projection order, so paging is deterministic on
    * any frame (full-duplicate rows are interchangeable — same multiset).
    *
    * `pagingSpec.pagingIdentifiers` resumes per segment: with
    * `fromNext=true` (the modern upstream default) an identifier is the
    * last offset already CONSUMED — rows strictly past it return; with
    * `fromNext=false` the caller pre-advanced it and the offset itself is
    * included. Unlisted segments return from the start. `threshold` caps
    * the page in scan direction across all segments.
    *
    * Scale shape: one shuffle on the day-chunk segment key for the offset
    * window (WindowGroupLimit caps nothing here — offsets must be stable
    * across pages, so every surviving row is numbered), then a global
    * top-`threshold` by time (TakeOrderedAndProject). That per-segment
    * total order is exactly why upstream replaced select with scan; this
    * implementation is the migration path, scan is the 100 TB path. */
  private def select(df: DataFrame, root: JsonNode): DataFrame = {
    opt(root, "granularity").foreach(g => require(
      g.isTextual && g.asText == "all",
      "select supports granularity 'all' only (bucketed select envelopes " +
        "were a serialization concern upstream; use scan or timeseries)"))
    val ds = opt(root, "dataSource") match {
      case Some(n) if n.isTextual => n.asText
      case Some(n) if str(n, "type", "") == "table" => str(n, "name", "inline")
      case _ => "inline"
    }
    val descending = opt(root, "descending").exists(_.asBoolean)
    val paging = opt(root, "pagingSpec").getOrElse(
      throw new IllegalArgumentException("select needs a pagingSpec"))
    val threshold = opt(paging, "threshold").map(_.asInt).getOrElse(0)
    require(threshold > 0, "select pagingSpec.threshold must be positive")
    val fromNext = opt(paging, "fromNext").forall(_.asBoolean)
    val identifiers: Seq[(String, Long)] =
      opt(paging, "pagingIdentifiers").toSeq
        .flatMap(_.propertyStream.iterator.asScala)
        .map(e => e.getKey -> e.getValue.asLong)
    val dims = opt(root, "dimensions").toSeq.flatMap(_.elements.asScala)
      .map(_.asText).toSeq
    val mets = opt(root, "metrics").toSeq.flatMap(_.elements.asScala)
      .map(_.asText).toSeq
    val dataCols =
      if (dims.isEmpty && mets.isEmpty) df.columns.toSeq.filter(_ != TimeCol)
      else dims ++ mets
    val segId = concat_ws("_", lit(ds), date_format(col(TimeCol), "yyyy-MM-dd"))
    val sortCols = (col(TimeCol) +: dataCols.map(col)).map(c =>
      if (descending) c.desc else c.asc)
    val rn = row_number().over(
      Window.partitionBy(segId).orderBy(sortCols: _*))
    val off = (if (descending) -rn else rn - lit(1)).cast("long")
    val numbered = df.select(
      (segId.as("segmentId") +: off.as("offset") +: col(TimeCol) +:
        dataCols.map(col)): _*)
    val resumed = identifiers.foldLeft(numbered) { case (d, (seg, o)) =>
      val consumed =
        if (descending) { if (fromNext) col("offset") >= o else col("offset") > o }
        else            { if (fromNext) col("offset") <= o else col("offset") < o }
      d.filter(!(col("segmentId") === seg && consumed))
    }
    resumed.orderBy(sortCols: _*).limit(threshold)
  }

  // ------------------------------------------------------------------ search

  /** search: per-dimension matching values with per-bucket counts — the
    * row shape of Druid's search result array. One narrow union branch per
    * searched dimension; each branch is a pruned (2-column) scan. */
  /** searchQuerySpec → predicate over a string column. Shared by the
    * `search` queryType and the `searchQuery` extractionFn, which accept
    * the same contains / insensitive_contains / fragment spec shapes
    * upstream (the search FILTER goes through the parsed
    * [[graft.pipeline.Filters]] path instead). */
  private def searchMatcher(q: JsonNode): Column => Column =
    str(q, "type", "") match {
      case "contains" =>
        // absent caseSensitive defaults FALSE (upstream's primitive boolean
        // — review finding r7; same default as the fragment branch and the
        // search FILTER path)
        val v = str(q, "value", "")
        if (opt(q, "caseSensitive").exists(_.asBoolean)) c => c.contains(v)
        else c => lower(c).contains(v.toLowerCase)
      case "insensitive_contains" =>
        val v = str(q, "value", "").toLowerCase
        c => lower(c).contains(v)
      case "fragment" =>
        val vs = opt(q, "values").toSeq.flatMap(_.elements.asScala).map(_.asText)
        require(vs.nonEmpty, "fragment search needs values")
        val sensitive = opt(q, "caseSensitive").exists(_.asBoolean)
        c => vs.map { v =>
          if (sensitive) c.contains(v) else lower(c).contains(v.toLowerCase)
        }.reduce(_ && _)
      case other => throw new IllegalArgumentException(
        s"unsupported search query type '$other' " +
          "(contains/insensitive_contains/fragment)")
    }

  private def search(df: DataFrame, root: JsonNode): DataFrame = {
    val dims = opt(root, "searchDimensions").toSeq.flatMap(_.elements.asScala)
      .map(_.asText).toSeq
    require(dims.nonEmpty, "search needs searchDimensions")
    val q = opt(root, "query").getOrElse(
      throw new IllegalArgumentException("search needs a query"))
    val matches: Column => Column = searchMatcher(q)
    val g = granularity(root)
    val gtz = granularityZone(root)
    val gorig = granularityOrigin(root)
    val grouped = dims.map { d =>
      df.select(truncateInZone(g, gtz, gorig)(col(TimeCol)).as(TimeCol),
          lit(d).as("dimension"), col(d).cast(StringType).as("value"))
        .filter(col("value").isNotNull && matches(col("value")))
    }.reduce(_.unionAll(_))
      .groupBy(TimeCol, "dimension", "value").agg(count(lit(1)).as("cnt"))
    // Druid search `sort` spec: orders the hit list through the shared
    // dimension-ordering keys (lexicographic/alphanumeric/numeric/strlen)
    opt(root, "sort").map(s => str(s, "type", "lexicographic")) match {
      case scala.None => grouped
      case Some(ordering) =>
        grouped.orderBy(col(TimeCol) +:
          dimOrderKeys(col("value"), ordering) :+ col("value") :+
          col("dimension"): _*)
    }
  }

  // ----------------------------------------------------------- timeBoundary

  private def timeBoundary(df: DataFrame, root: JsonNode): DataFrame =
    str(root, "bound", "") match {
      case "minTime" => df.agg(min(col(TimeCol)).as("minTime"))
      case "maxTime" => df.agg(max(col(TimeCol)).as("maxTime"))
      case "" => df.agg(min(col(TimeCol)).as("minTime"),
        max(col(TimeCol)).as("maxTime"))
      case other => throw new IllegalArgumentException(
        s"unsupported timeBoundary bound '$other' (minTime/maxTime)")
    }

  // -------------------------------------------------------- segmentMetadata

  /** Druid segmentMetadata analog at dataSource resolution: one row per
    * analyzed column — type, exact cardinality, min/max (rendered as
    * strings, the JSON envelope's form), null count, table rows. All
    * per-column aggregates compute in ONE pass over the data (a single
    * agg row, unpivoted in-plan); per-SEGMENT resolution lives on
    * [[graft.sink.SegmentStore.metadata]]. Delta vs upstream: cardinality
    * is exact (count_distinct), not the sketch estimate.
    */
  private def segmentMetadata(df: DataFrame, root: JsonNode): DataFrame = {
    val wanted = opt(root, "columns").toSeq.flatMap(_.elements.asScala)
      .map(_.asText)
    val names =
      if (wanted.isEmpty) df.columns.toSeq
      else {
        wanted.foreach(c => require(df.columns.contains(c),
          s"segmentMetadata column '$c' does not exist"))
        wanted
      }
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = names.flatMap { c => Seq(
      count_distinct(col(c)).as(s"card__$c"),
      min(col(c)).cast(StringType).as(s"min__$c"),
      max(col(c)).cast(StringType).as(s"max__$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"))
    } :+ count(lit(1)).as("__rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.map { c =>
        struct(lit(c).as("column"),
          lit(types(c).simpleString).as("col_type"),
          col(s"card__$c").as("cardinality"),
          col(s"min__$c").as("min_value"),
          col(s"max__$c").as("max_value"),
          coalesce(col(s"nulls__$c"), lit(0L)).as("null_count"),
          col("__rows").as("num_rows"))
      }: _*)).as("m"))
      // struct EXPANSION — must dodge the exact-name col shadow above
      .select(org.apache.spark.sql.functions.col("m.*"))
  }

  // ---------------------------------------------------------- movingAverage

  /** Druid movingAverage extension: trailing-window averagers over a
    * zero-filled timeseries/groupBy. Upstream semantics reproduced:
    *  - the underlying query's time range extends BACKWARD by the largest
    *    averager window so the interval's first bucket averages a full
    *    window (that is why compile() hands this type the frame WITHOUT
    *    the intervals clause pre-applied);
    *  - empty buckets count as zero (the dense bucket frame is generated
    *    in-plan — sequence + explode, broadcast against the aggregate);
    *  - only buckets inside the declared interval are emitted.
    * Requires ONE interval and any bucketing granularity: fixed-width,
    * calendar, zoned, and origin-anchored all work — the window steps
    * whole buckets in the granularity's own space via [[bucketStartMs]] /
    * [[bucketFrame]] (a 2-month window really steps one calendar month; a
    * zoned window crosses DST with the 23-hour day intact).
    * Averagers: double/long Mean/Sum/Max/Min over an aggregation name.
    */
  private def movingAverage(df: DataFrame, root: JsonNode): DataFrame = {
    val gran = granularity(root)
    val gtz = granularityZone(root)
    val gorig = granularityOrigin(root)
    require(gran != Granularity.All && gran != Granularity.None,
      "movingAverage needs a bucketing granularity")
    val intervals = intervalMillis(root)
    require(intervals.length == 1, "movingAverage needs exactly one interval")
    val (startMs, endMs) = intervals.head
    require(endMs > startMs, "movingAverage interval is empty")

    val averagers = opt(root, "averagers").toSeq.flatMap(_.elements.asScala).toSeq
    require(averagers.nonEmpty, "movingAverage needs averagers")
    // constant averagers have no window; every windowed one needs buckets
    val maxBuckets = averagers
      .filterNot(a => str(a, "type", "") == "constant")
      .map(a => opt(a, "buckets").map(_.asInt).getOrElse(
        throw new IllegalArgumentException("averager needs buckets")))
      .foldLeft(1)(math.max)
    require(maxBuckets >= 1, "averager buckets must be >= 1")

    val dims = opt(root, "dimensions").toSeq.flatMap(_.elements.asScala)
      .map(dimensionSpec).toSeq
    val dimNames = dims.map(_._1)

    // underlying aggregation over the backward-extended range — the window
    // steps back whole BUCKETS (wall-clock steps for zoned/calendar
    // granularities, anchored steps under an origin)
    val extStartMs = bucketStartMs(gran, gtz, gorig, startMs,
      (maxBuckets - 1).toLong)
    val extended = df.filter(col(TimeCol) >= timestamp_millis(lit(extStartMs)) &&
      col(TimeCol) < timestamp_millis(lit(endMs)))
    val base = aggregate(extended, root, dims)

    // dense bucket frame [extStart, lastBucket], engine-side
    val buckets = bucketFrame(df.sparkSession, Seq((extStartMs, endMs)), gran,
      gtz, gorig)
    val frame =
      if (dims.isEmpty) buckets
      else buckets.crossJoin(base.select(dimNames.map(col): _*).distinct())

    require(opt(root, "aggregations").exists(_.elements.asScala.nonEmpty),
      "movingAverage needs aggregations")
    // NULL-SAFE dim equality: a null dimension VALUE is a legitimate group
    // (Druid renders it); a plain equi-join would orphan its base rows and
    // zero-fill the frame side — silent wrong data
    val bCols = Seq(col(TimeCol).as("__bt")) ++
      dimNames.map(n => col(n).as(s"__bd_$n")) ++
      base.columns.filterNot(c => c == TimeCol || dimNames.contains(c))
        .toSeq.map(col)
    val bJoin = base.select(bCols: _*).withColumn(PresentCol, lit(true))
    val cond = (col(TimeCol) === col("__bt")) +: dimNames.map(n =>
      col(n) <=> col(s"__bd_$n"))
    val joined = frame.join(bJoin, cond.reduce(_ && _), "left")
      .drop("__bt").drop(dimNames.map(n => s"__bd_$n"): _*)
    // EMPTY buckets (join misses — the PresentCol marker): counts/sums
    // (incl. through filtered wrappers) become zero; min/max/first/last/
    // sketches keep null — Druid's identities. A present bucket whose sum is
    // legitimately null keeps its null. Finalized before the averagers read
    // them (averagers window over finalized metric values).
    val zeroFilled =
      finalizeAggs(zeroFill(joined, root, base), root).drop(PresentCol)

    // Upstream's FULL averager set (the movingAverage extension ships
    // constant + double/long {Mean, MeanNoNulls, Sum, Max, Min} — there is
    // no cumulative averager upstream; an expanding window is buckets =
    // interval length). Semantics per upstream:
    //  - Mean divides by the FULL window width, counting empty/null buckets
    //    as zero (inputs coalesced — a postAgg field that is null on an
    //    empty bucket must not silently shrink the window);
    //  - MeanNoNulls divides by the count of non-null buckets only;
    //  - Sum coalesces nulls to zero (an all-empty window sums to 0);
    //  - Max/Min ignore nulls (identity = null on an all-empty window).
    // cycleSize != 1 (every-Nth-bucket cycles) is rejected loudly.
    val w = Window.partitionBy(dimNames.map(col): _*).orderBy(col(TimeCol))
    val withAvg = averagers.foldLeft(zeroFilled) { (d, a) =>
      val name = str(a, "name", "")
      require(name.nonEmpty, "averager needs a name")
      val c = str(a, "type", "") match {
        case "constant" =>
          lit(opt(a, "value").map(_.asDouble).getOrElse(
            throw new IllegalArgumentException("constant averager needs a value")))
        case t =>
          val fieldN = str(a, "fieldName", "")
          require(fieldN.nonEmpty, s"averager '$name' needs a fieldName")
          val b = opt(a, "buckets").map(_.asInt).getOrElse(
            throw new IllegalArgumentException(s"averager '$name' needs buckets"))
          require(b >= 1, "averager buckets must be >= 1")
          val cycle = opt(a, "cycleSize").map(_.asInt).getOrElse(1)
          require(cycle == 1,
            s"averager '$name': cycleSize $cycle is not supported (only 1)")
          val over = w.rowsBetween(-(b - 1), 0)
          val zeroed = coalesce(col(fieldN), lit(0))
          t match {
            case "doubleMean" | "longMean" =>
              (sum(zeroed).over(over) / b).cast("double")
            case "doubleMeanNoNulls" | "longMeanNoNulls" =>
              avg(col(fieldN)).over(over)
            case "doubleSum" => sum(zeroed).over(over).cast("double")
            case "longSum"   => sum(zeroed).over(over).cast("long")
            case "doubleMax" | "longMax" => max(col(fieldN)).over(over)
            case "doubleMin" | "longMin" => min(col(fieldN)).over(over)
            case other => throw new IllegalArgumentException(
              s"unsupported averager type '$other' (constant, " +
                "double|long Mean/MeanNoNulls/Sum/Max/Min — upstream's " +
                "full set; no cumulative averagers exist upstream)")
          }
      }
      d.withColumn(name, c)
    }
    // emit only buckets of the declared interval — its first bucket is the
    // TRUNCATED start (Druid's timeseries envelope), not the raw instant
    val firstBucketMs = bucketStartMs(gran, gtz, gorig, startMs)
    withAvg.filter(col(TimeCol) >= timestamp_millis(lit(firstBucketMs)))
  }

  // ----------------------------------------------------------------- helpers

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n).flatMap(x => Option(x.get(field)))

  private def str(n: JsonNode, field: String, default: String): String =
    opt(n, field).map(_.asText).getOrElse(default)
}
