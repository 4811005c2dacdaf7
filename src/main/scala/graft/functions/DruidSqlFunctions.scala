package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.time.Granularity

/** Druid SQL's function surface as Spark analysis-time rewrites, so verbatim
  * upstream Druid SQL runs on `/druid/v2/sql` (and anywhere else the session
  * has graft functions registered). Upstream pairs tranquility with Druid SQL
  * (SURVEY §2.9 query analogs; `server/.../TranquilityServlet.scala` is the
  * ingest twin of the endpoint) — a real user's first query is
  * `SELECT TIME_FLOOR(__time, 'PT1H'), APPROX_COUNT_DISTINCT_DS_HLL(user)…`,
  * and with this shim it runs unmodified.
  *
  * Spark-first shape: every function is a BUILDER that rewrites to native
  * Catalyst expressions at analysis (granularity truncation = the same
  * epoch-arithmetic `Granularity.truncate` the ingest side uses; DS_HLL =
  * Spark's own Apache DataSketches `hll_sketch_agg`, the SAME sketch library
  * Druid uses; theta/quantile sketches = the engine's existing aggregates).
  * Nothing here adds an execution operator — whole-stage codegen and
  * pushdown see only built-in expressions.
  *
  * Timezone arguments: only UTC is accepted (the engine stores event time as
  * UTC instants and sessions run UTC — a non-UTC tz is a loud error, not a
  * silent shift). Origins: TIME_FLOOR/TIME_CEIL accept a custom origin for
  * fixed-width periods (integer epoch arithmetic; calendar periods have no
  * origin semantics upstream either).
  *
  * Sketch exactness (oracle convention, QueryDef rules): DataSketches HLL
  * and the theta/centroid sketches are EXACT below their promotion
  * thresholds, so `druid_sql_*` oracles pin k above the data's cardinality
  * and hash-match against DuckDB's exact aggregates — the same trick the
  * `theta_*`/`percentile_exact` oracle rows use.
  */
object DruidSqlFunctions {

  private def asCol(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  /** Timestamp-argument binding for the time family: accepts TIMESTAMP_NTZ
    * (what Spark 4 reads for vanilla parquet `timestamp[us]`) alongside
    * TIMESTAMP — `unix_millis`/`unix_timestamp` reject NTZ outright, and the
    * cast is a no-op for TZ input and value-identical under the UTC session
    * zone.
    */
  private def tsArg(e: Expression): Column = asCol(e).cast("timestamp")

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _)     => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _)        => v.toDouble
    case Literal(v: Long, _)       => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** Druid SQL period literal → engine granularity. ISO-8601 durations and
    * day-multiples go through [[Granularity.fromString]]; calendar periods
    * map to the calendar granularities. */
  private[functions] def period(p: String): Granularity =
    Granularity.fromPeriod(p)

  /** Timezone argument → Some(zone) for a real non-UTC zone, None for
    * UTC/absent/null. The zone must be a known IANA/offset id at plan time —
    * an unknown zone is a loud error, never a silently ignored argument
    * (Druid granularity accepts arbitrary chronology zones; upstream
    * ClusteredBeamTuning.scala#segmentBucket).
    */
  private def tzOpt(e: Option[Expression], fn: String): Option[String] =
    e match {
      case None | Some(Literal(null, _)) => None
      case Some(other) =>
        val tz = strLit(other, s"$fn timezone")
        require(scala.util.Try(java.time.ZoneId.of(tz)).isSuccess,
          s"$fn: unknown timezone '$tz'")
        Some(tz).filterNot(Seq("UTC", "Etc/UTC", "Z", "+00:00").contains)
    }

  /** Calendar-op-in-zone sandwich: shift the instant to the zone's wall
    * clock, apply `op` there, shift back to the UTC instant — Druid's
    * PeriodGranularity-with-timezone rule (buckets align to the zone's local
    * calendar; results stay instants). UTC (None) applies `op` directly, the
    * identical plan to the UTC-only path. Both conversions use the JVM's
    * IANA tzdata — the same rules the DuckDB/ICU oracle applies; ambiguous
    * fall-back wall times resolve to the earlier offset on both engines.
    */
  private def inZone(ts: Column, tz: Option[String])(op: Column => Column): Column =
    tz match {
      case None    => op(ts)
      case Some(z) => to_utc_timestamp(op(from_utc_timestamp(ts, z)), z)
    }

  /** Wall-clock view of an instant for extract/format (no shift back). */
  private def wallClock(ts: Column, tz: Option[String]): Column =
    tz.map(z => from_utc_timestamp(ts, z)).getOrElse(ts)

  /** TIME_FLOOR/TIME_CEIL origin argument → epoch millis. Druid SQL writes
    * origins as ISO strings OR timestamp literals (`TIMESTAMP '…'` parses to
    * a TimestampType literal); a non-literal origin is a loud error, never a
    * silently dropped argument. */
  private def originMillis(e: Expression, fn: String): Option[Long] = e match {
    case Literal(null, _) => None
    case Literal(s, StringType) => Some(instantMillis(s.toString))
    case Literal(us: Long, _: org.apache.spark.sql.types.TimestampType) =>
      Some(Math.floorDiv(us, 1000L)) // TimestampType literals carry MICROS
    case other => throw new IllegalArgumentException(
      s"$fn origin must be a literal timestamp or ISO-8601 string, got $other")
  }

  /** Dotted-quad string → unsigned-int-as-long; null when not a valid
    * IPv4 (pure Column arithmetic: regex gate short-circuits the octet
    * range check, so the ANSI int cast only ever sees ≤3 digits). */
  private def ipv4ToLong(s: Column): Column = {
    val parts = split(s, "\\.")
    val valid = s.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$") &&
      forall(parts, x => x.cast("int") <= 255)
    when(valid, aggregate(parts, lit(0L), (acc, x) => acc * 256 + x.cast("long")))
  }

  /** TRY-mode long cast (null on unparseable, no ANSI throw). */
  private def tryCastLong(c: Column): Column =
    asCol(org.apache.spark.sql.catalyst.expressions.Cast(
      ex(c), org.apache.spark.sql.types.LongType, None,
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))

  /** Null unless the long is a valid unsigned-int IPv4 value. */
  private def ipv4Range(n: Column): Column =
    when(n >= 0L && n <= 4294967295L, n)

  /** Shared body of the HUMAN_READABLE_* functions: 1024-base binary units
    * (Ki..Ei) or 1000-base decimal units (K..E), with optional "B" suffix;
    * `"%.Pf unit"` over value/divisor, trailing space trimmed for the
    * unit-less decimal format. Input casts to long (integral bytes/counts —
    * Druid's formatter signature); precision is a literal in 0..3. */
  private def humanReadable(args: Seq[Expression], name: String,
      base: Long, suffix: String): Expression = {
    arity(args, s"$name(value[, precision])", 1, 2)
    val precision =
      if (args.length == 2) intLit(args(1), s"$name precision") else 2
    require(precision >= 0 && precision <= 3,
      s"$name precision must be in [0, 3], got $precision")
    val units =
      if (base == 1024L) Seq("", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei")
      else Seq("", "K", "M", "G", "T", "P", "E")
    // TRY cast: NaN/Infinity and doubles past Long.MaxValue → null, no
    // ANSI throw; |b| runs in DOUBLE so Long.MinValue can't overflow
    // ANSI abs() (the one-ulp bucket imprecision this admits only
    // matters past 2^53 — the format output there is unchanged)
    val b = tryCastLong(asCol(args(0)))
    val absB = abs(b.cast("double"))
    def bucket(power: Int): Column = {
      val divisor = math.pow(base.toDouble, power).toLong
      val label = (units(power) + suffix).trim
      val pattern = if (label.isEmpty) s"%.${precision}f" else s"%.${precision}f $label"
      format_string(pattern, b.cast("double") / divisor)
    }
    // largest unit whose divisor ≤ |value| — thresholds are exact long
    // literals, so bucket edges (1024, 1000², …) can't misround
    val chain = (1 to 5).foldLeft(when(absB < base, bucket(0))) {
      (acc, power) =>
        acc.when(absB < math.pow(base.toDouble, power + 1).toLong, bucket(power))
    }.otherwise(bucket(6))
    ex(when(b.isNotNull, chain))
  }

  /** ISO-8601 instant literal → epoch millis (driver-side). */
  // ONE definition (graft.time.Intervals) — a second private copy here had
  // drifted past the date-only fallback too (review finding r7)
  private def instantMillis(s: String): Long =
    graft.time.Intervals.parseInstantMillis(s)

  /** TIME_FLOOR with a custom origin: integer epoch-millis arithmetic
    * (x − pmod(x − origin, width)) — exact, codegen-friendly. */
  private def floorAt(ts: Column, originMs: Long, widthMs: Long): Column = {
    val x = unix_millis(ts)
    timestamp_millis(x - pmod(x - lit(originMs), lit(widthMs)))
  }

  /** Next calendar-bucket start for TIME_CEIL's calendar path (input is the
    * already-truncated, midnight-aligned bucket start). */
  private def calendarNext(tr: Column, g: Granularity): Column = g match {
    case Granularity.Week    => date_add(tr.cast("date"), 7).cast("timestamp")
    case Granularity.Month   => add_months(tr.cast("date"), 1).cast("timestamp")
    case Granularity.Quarter => add_months(tr.cast("date"), 3).cast("timestamp")
    case Granularity.Year    => add_months(tr.cast("date"), 12).cast("timestamp")
    case other => throw new IllegalArgumentException(
      s"TIME_CEIL does not support granularity ${other.name}")
  }

  private type Builder = Seq[Expression] => Expression

  private def fn(name: String, builder: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(DruidSqlFunctions.getClass.getName, name), builder)

  private def arity(args: Seq[Expression], fn: String, lo: Int, hi: Int): Unit =
    require(args.length >= lo && args.length <= hi,
      s"$fn takes $lo..$hi arguments, got ${args.length}")

  /** True when the argument is syntactically an ARRAY (multi-value) —
    * builders run pre-analysis so data types are not yet known; Druid SQL
    * writes multi-value literals as ARRAY[…] / array(…). */
  private def isArrayArg(e: Expression): Boolean = e match {
    case _: CreateArray => true
    case Literal(_, _: ArrayType) => true
    case f: UnresolvedFunction =>
      f.nameParts.last.equalsIgnoreCase("array")
    case _ => false
  }

  /** Dialect-scoped overrides: Druid SQL functions whose NAME collides with
    * a Spark builtin but whose SEMANTICS differ. These are applied only by
    * [[graft.queries.DruidSql]] as a plan rewrite on `/druid/v2/sql`
    * statements — never registered session-wide, so plain Spark SQL on the
    * same session keeps builtin behavior (the TRUNC-shadowing lesson).
    *
    * REGEXP_EXTRACT diverges twice: Druid's group index defaults to 0 (the
    * whole match) where Spark SQL defaults to 1, and Druid returns NULL on
    * no-match where Spark returns the empty string. RLIKE carries Druid's
    * find() containment semantics, so it gates exactly the rows Druid's
    * matcher accepts; an empty capture on a MATCHED row stays "" (both
    * engines).
    *
    * Built from catalyst expressions DIRECTLY (not the functions._ DSL):
    * in Spark 4 `functions.regexp_extract` itself lowers to an
    * `UnresolvedFunction("regexp_extract", …)`, which the rewrite rule would
    * match again — an infinite self-rewrite. */
  private[graft] val dialectOverrides: Map[String, Builder] = Map(
    "regexp_extract" -> (args => {
      arity(args, "regexp_extract(s, pattern[, index])", 2, 3)
      import org.apache.spark.sql.catalyst.expressions.{Cast, CaseWhen, RegExpExtract, RLike}
      val s = Cast(args(0), StringType)
      val pat = Literal(strLit(args(1), "regexp_extract pattern"))
      val idx = Literal(
        if (args.length == 3) intLit(args(2), "regexp_extract index") else 0)
      CaseWhen(Seq((RLike(s, pat), RegExpExtract(s, pat, idx))), None)
    })
  )

  private[graft] val injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(

    // ------------------------------------------------------ time functions
    fn("time_floor", args => {
      arity(args, "time_floor(ts, period[, origin[, tz]])", 2, 4)
      val tz = tzOpt(args.lift(3), "TIME_FLOOR")
      val g = period(strLit(args(1), "time_floor period"))
      val origin = args.lift(2).flatMap(originMillis(_, "time_floor"))
      origin match {
        case None => ex(inZone(tsArg(args(0)), tz)(g.truncate))
        case Some(o) =>
          require(g.widthSeconds > 0,
            "time_floor origin needs a fixed-width period")
          // origin-aligned fixed-width floor is ((x−o) mod w) in instant
          // space — timezone-invariant (tz shifts only the DEFAULT origin,
          // which an explicit origin overrides; Druid PeriodGranularity)
          ex(floorAt(tsArg(args(0)), o, g.widthSeconds * 1000L))
      }
    }),

    fn("time_ceil", args => {
      arity(args, "time_ceil(ts, period[, origin[, tz]])", 2, 4)
      val tz = tzOpt(args.lift(3), "TIME_CEIL")
      val g = period(strLit(args(1), "time_ceil period"))
      val ts = tsArg(args(0))
      val origin = args.lift(2).flatMap(originMillis(_, "time_ceil"))
      def ceilAt(t: Column, o: Long, w: Long): Column = {
        val x = unix_millis(t)
        val r = pmod(x - lit(o), lit(w))
        timestamp_millis(when(r === 0, x).otherwise(x - r + lit(w)))
      }
      if (g.widthSeconds > 0) {
        val w = g.widthSeconds * 1000L
        origin match {
          // explicit origin: instant-space, tz-invariant (see time_floor)
          case Some(o) => ex(ceilAt(ts, o, w))
          // default origin = the zone's local epoch → wall-clock arithmetic
          case None    => ex(inZone(ts, tz)(ceilAt(_, 0L, w)))
        }
      } else {
        require(origin.isEmpty, "time_ceil origin needs a fixed-width period")
        ex(inZone(ts, tz) { wall =>
          val tr = g.truncate(wall)
          when(tr === wall, wall).otherwise(calendarNext(tr, g))
        })
      }
    }),

    fn("time_shift", args => {
      arity(args, "time_shift(ts, period, step[, tz])", 3, 4)
      val tz = tzOpt(args.lift(3), "TIME_SHIFT")
      val g = period(strLit(args(1), "time_shift period"))
      val ts = tsArg(args(0))
      val step = asCol(args(2)).cast("long")
      if (g.widthSeconds > 0)
        // fixed-duration shift: integer epoch arithmetic (keeps sub-second
        // precision), timezone-invariant by definition
        ex(timestamp_millis(unix_millis(ts) + step * lit(g.widthSeconds * 1000L)))
      else {
        // calendar shifts preserve LOCAL time-of-day in the zone
        // (timestamp_add on the wall clock, Druid's chronology rule)
        val (unit, n) = g match {
          case Granularity.Week    => ("WEEK", 1)
          case Granularity.Month   => ("MONTH", 1)
          case Granularity.Quarter => ("MONTH", 3)
          case Granularity.Year    => ("YEAR", 1)
          case other => throw new IllegalArgumentException(
            s"time_shift does not support granularity ${other.name}")
        }
        ex(inZone(ts, tz)(timestamp_add(unit, step * n, _)))
      }
    }),

    fn("time_extract", args => {
      arity(args, "time_extract(ts, unit[, tz])", 2, 3)
      val tz = tzOpt(args.lift(2), "TIME_EXTRACT")
      val unit = strLit(args(1), "time_extract unit").toUpperCase
      // EPOCH/MILLIS are properties of the instant (tz-independent);
      // calendar fields extract from the zone's wall clock
      val ts =
        if (Seq("EPOCH", "MILLIS").contains(unit)) tsArg(args(0))
        else wallClock(tsArg(args(0)), tz)
      val c = unit match {
        case "EPOCH"   => unix_timestamp(ts)
        case "MILLIS"  => unix_millis(ts)
        case "SECOND"  => second(ts)
        case "MINUTE"  => minute(ts)
        case "HOUR"    => hour(ts)
        case "DAY"     => dayofmonth(ts)
        // Druid DOW is ISO: 1 = Monday … 7 = Sunday (Spark weekday is 0-based Monday)
        case "DOW" | "ISODOW" => weekday(ts) + lit(1)
        case "DOY"     => dayofyear(ts)
        case "WEEK"    => weekofyear(ts)
        case "MONTH"   => month(ts)
        case "QUARTER" => quarter(ts)
        case "YEAR"    => year(ts)
        // ISO week-based year = year of this ISO week's THURSDAY (differs
        // from the calendar year for ~3 days around each new year)
        case "ISOYEAR" =>
          year(date_add(date_trunc("week", ts).cast("date"), 3))
        case other => throw new IllegalArgumentException(
          s"time_extract unit '$other' not supported (EPOCH/MILLIS/SECOND/" +
            "MINUTE/HOUR/DAY/DOW/DOY/WEEK/MONTH/QUARTER/YEAR)")
      }
      ex(c.cast("long"))
    }),

    fn("time_in_interval", args => {
      arity(args, "time_in_interval(ts, 'start/end')", 2, 2)
      val iv = strLit(args(1), "time_in_interval interval")
      val parts = iv.split("/", 2)
      require(parts.length == 2, s"interval '$iv' is not start/end")
      val (lo, hi) = (instantMillis(parts(0)), instantMillis(parts(1)))
      require(hi > lo, s"interval '$iv' is empty")
      val ts = tsArg(args(0))
      // [start, end) like the intervals clause — integer millis comparisons
      ex(ts >= timestamp_millis(lit(lo)) && ts < timestamp_millis(lit(hi)))
    }),

    fn("millis_to_timestamp", args => {
      arity(args, "millis_to_timestamp(millis)", 1, 1)
      ex(timestamp_millis(asCol(args(0)).cast("long")))
    }),

    fn("timestamp_to_millis", args => {
      arity(args, "timestamp_to_millis(ts)", 1, 1)
      ex(unix_millis(tsArg(args(0))))
    }),

    fn("time_parse", args => {
      arity(args, "time_parse(str[, pattern[, tz]])", 1, 3)
      val tz = tzOpt(args.lift(2), "TIME_PARSE")
      // null on failure, Druid's contract (ANSI to_timestamp would throw)
      val parsed =
        if (args.length >= 2 && args(1) != Literal(null))
          try_to_timestamp(asCol(args(0)), lit(strLit(args(1), "time_parse pattern")))
        else try_to_timestamp(asCol(args(0)))
      // a tz argument means the string is LOCAL wall time in that zone
      ex(tz.map(z => to_utc_timestamp(parsed, z)).getOrElse(parsed))
    }),

    fn("time_format", args => {
      arity(args, "time_format(ts[, pattern[, tz]])", 1, 3)
      val tz = tzOpt(args.lift(2), "TIME_FORMAT")
      val pattern =
        if (args.length >= 2 && args(1) != Literal(null))
          strLit(args(1), "time_format pattern")
        else "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'" // Druid's ISO default (UTC)
      ex(date_format(wallClock(tsArg(args(0)), tz), pattern))
    }),

    // ------------------------------------------- JSON (nested-columns) fns
    // Druid's SQL JSON surface over string-typed JSON columns. JSON_VALUE
    // and JSON_QUERY both ride get_json_object (scalar paths return the
    // scalar text, object paths return the JSON subtree — Druid's split
    // between the two collapses because Spark's JSON text extraction serves
    // both); PARSE_JSON needs no shim (Spark 4 variant builtin).
    fn("json_value", args => {
      arity(args, "json_value(expr, path)", 2, 2)
      ex(get_json_object(asCol(args(0)), strLit(args(1), "json_value path")))
    }),

    fn("json_query", args => {
      arity(args, "json_query(expr, path)", 2, 2)
      ex(get_json_object(asCol(args(0)), strLit(args(1), "json_query path")))
    }),

    fn("json_keys", args => {
      arity(args, "json_keys(expr[, path])", 1, 2)
      val target =
        if (args.length == 2)
          get_json_object(asCol(args(0)), strLit(args(1), "json_keys path"))
        else asCol(args(0))
      ex(json_object_keys(target))
    }),

    fn("to_json_string", args => {
      arity(args, "to_json_string(expr)", 1, 1)
      ex(to_json(asCol(args(0))))
    }),

    // ------------------------------------------------- naming-parity fns
    // STRLEN = Druid's LENGTH alias; ARRAY_* are the ARRAY-typed twins of
    // the MV_* family (identical semantics on multi-value strings — Druid
    // documents them as the same functions over the two types).
    fn("strlen", args => {
      arity(args, "strlen(s)", 1, 1)
      ex(length(asCol(args(0))))
    }),

    fn("array_length", args => {
      arity(args, "array_length(arr)", 1, 1)
      ex(size(asCol(args(0))))
    }),

    fn("array_offset", args => {
      arity(args, "array_offset(arr, idx)", 2, 2)
      ex(get(asCol(args(0)), asCol(args(1))))
    }),

    fn("array_ordinal", args => {
      arity(args, "array_ordinal(arr, idx)", 2, 2)
      ex(try_element_at(asCol(args(0)), asCol(args(1))))
    }),

    fn("array_to_mv", args => {
      arity(args, "array_to_mv(arr)", 1, 1)
      // MVDs are string-typed: cast every element to string
      ex(transform(asCol(args(0)), x => x.cast(StringType)))
    }),

    // --------------------------------------------------- sketch aggregates
    // DS_HLL family = Spark's Apache DataSketches HLL — the same library
    // Druid's datasketches extension uses. Input cast to string (Druid
    // hashes the string form; hll_sketch_agg accepts int/long/string/binary).
    fn("approx_count_distinct_ds_hll", args => {
      arity(args, "approx_count_distinct_ds_hll(col[, lgK])", 1, 2)
      val in = asCol(args(0)).cast(StringType)
      val sketch = if (args.length == 2)
        hll_sketch_agg(in, intLit(args(1), "lgK")) else hll_sketch_agg(in)
      ex(round(hll_sketch_estimate(sketch)).cast("long"))
    }),

    fn("ds_hll", args => {
      arity(args, "ds_hll(col[, lgK])", 1, 2)
      val in = asCol(args(0)).cast(StringType)
      ex(if (args.length == 2) hll_sketch_agg(in, intLit(args(1), "lgK"))
         else hll_sketch_agg(in))
    }),
    // HLL_SKETCH_ESTIMATE is already a native Spark function (same name).

    fn("approx_count_distinct_ds_theta", args => {
      arity(args, "approx_count_distinct_ds_theta(col[, k])", 1, 2)
      val k = if (args.length == 2) intLit(args(1), "k") else 16384 // Druid default
      val agg = ThetaSketchAgg(ex(asCol(args(0)).cast(StringType)), k)
        .toAggregateExpression()
      ex(round(asCol(ThetaEstimate(agg))).cast("long"))
    }),

    fn("ds_theta", args => {
      arity(args, "ds_theta(col[, k])", 1, 2)
      val k = if (args.length == 2) intLit(args(1), "k") else 16384
      ThetaSketchAgg(ex(asCol(args(0)).cast(StringType)), k).toAggregateExpression()
    }),

    fn("theta_sketch_estimate", args => {
      arity(args, "theta_sketch_estimate(sketch)", 1, 1)
      ThetaEstimate(args(0))
    }),

    // sketch-returning set ops (Druid's contract: the result feeds
    // THETA_SKETCH_ESTIMATE or further set ops) — exact in the sparse
    // regime; the engine's scalar theta_intersect/theta_difference remain
    // the accurate saturated-regime estimates (see ThetaSetOp scaladoc)
    fn("theta_sketch_intersect", args => {
      arity(args, "theta_sketch_intersect(a, b)", 2, 2)
      ThetaSetOp(args(0), args(1), intersect = true)
    }),

    fn("theta_sketch_not", args => {
      arity(args, "theta_sketch_not(a, b)", 2, 2)
      ThetaSetOp(args(0), args(1), intersect = false)
    }),

    // THETA_SKETCH_UNION([size,] expr0, expr1, ...): Druid's optional
    // leading size literal is accepted and IGNORED (sketches carry their
    // own k; merging keeps the smaller) — folds pairwise over 2+ sketches
    fn("theta_sketch_union", args => {
      arity(args, "theta_sketch_union([size,] a, b, ...)", 2, 64)
      val sketches = args.head match {
        case Literal(_: Int, _) | Literal(_: Long, _) =>
          require(args.length >= 3,
            "theta_sketch_union with a size literal needs 2+ sketches")
          args.tail
        case _ => args
      }
      sketches.reduce(ThetaSketchUnion(_, _))
    }),

    // DataSketches tuple extension (ArrayOfDoublesSketch). Forms follow
    // upstream arity: DS_TUPLE_DOUBLES(sketchCol) re-unions pre-built
    // sketches; DS_TUPLE_DOUBLES(key, m1[, m2…][, nominalEntries]) builds
    // one from raw rows (trailing int literal = nominalEntries).
    fn("ds_tuple_doubles", args => {
      arity(args, "ds_tuple_doubles(key, metrics…[, nominalEntries])", 1, 66)
      if (args.length == 1) TupleUnionAgg(args.head).toAggregateExpression()
      else {
        val (k, rest) = args.last match {
          case Literal(v: Int, _) if args.length >= 3 => (v, args.dropRight(1))
          case _ => (TupleSketch.DefaultK, args)
        }
        require(rest.length >= 2,
          "ds_tuple_doubles needs a key and at least one metric column")
        val metrics = CreateArray(rest.tail.map(m => ex(asCol(m).cast("double"))))
        TupleSketchAgg(ex(asCol(rest.head).cast(StringType)), metrics, k)
          .toAggregateExpression()
      }
    }),

    fn("ds_tuple_doubles_metrics_sum_estimate", args => {
      arity(args, "ds_tuple_doubles_metrics_sum_estimate(sketch)", 1, 1)
      TupleMetricsSum(args(0))
    }),

    // sketch-valued set ops (summaries sum — upstream
    // ArrayOfDoublesSetOperationBuilder); a trailing size literal is
    // accepted and IGNORED like THETA_SKETCH_UNION's (sketches carry
    // their own k; merging keeps the smaller)
    fn("ds_tuple_doubles_union", args => {
      arity(args, "ds_tuple_doubles_union(a, b, …[, nominalEntries])", 2, 66)
      val sketches = args.last match {
        case Literal(_: Int, _) | Literal(_: Long, _) =>
          require(args.length >= 3,
            "ds_tuple_doubles_union with a size literal needs 2+ sketches")
          args.dropRight(1)
        case _ => args
      }
      sketches.reduce(TupleSetOp(_, _, "UNION"))
    }),

    fn("ds_tuple_doubles_intersect", args => {
      arity(args, "ds_tuple_doubles_intersect(a, b, …)", 2, 66)
      args.reduce(TupleSetOp(_, _, "INTERSECT"))
    }),

    fn("ds_tuple_doubles_not", args => {
      arity(args, "ds_tuple_doubles_not(a, b)", 2, 2)
      TupleSetOp(args(0), args(1), "NOT")
    }),

    // Druid bloom extension: BLOOM_FILTER(expr, maxNumEntries) aggregates
    // a serialized filter (sized at Druid BloomKFilter's default 5% fpp);
    // BLOOM_FILTER_TEST(expr, filter) probes it — false ⇒ definitely
    // absent. Rides the engine's BloomAgg/BloomMightContain.
    fn("bloom_filter", args => {
      arity(args, "bloom_filter(expr, maxNumEntries)", 2, 2)
      val n = intLit(args(1), "bloom_filter maxNumEntries")
      require(n > 0, s"bloom_filter maxNumEntries must be positive, got $n")
      val bits = BloomSketch.optimalBits(n, 0.05)
      BloomAgg(ex(asCol(args(0)).cast(StringType)), bits,
        BloomSketch.optimalHashes(n, bits)).toAggregateExpression()
    }),
    fn("bloom_filter_test", args => {
      arity(args, "bloom_filter_test(expr, filter)", 2, 2)
      BloomMightContain(args(1), ex(asCol(args(0)).cast(StringType)))
    }),

    // ARRAY_CONCAT_AGG(arr): concatenation of the group's arrays (element
    // order across rows unspecified — Druid's contract too). NULL when
    // nothing aggregated (empty group / all-null inputs), like Druid —
    // collect_list alone would yield a non-null []
    fn("array_concat_agg", args => {
      arity(args, "array_concat_agg(arr)", 1, 1)
      val arr = asCol(args(0))
      ex(when(count(arr) > 0, flatten(collect_list(arr))))
    }),

    // Druid's approxHistogram-backed APPROX_QUANTILE (the non-DataSketches
    // form): Spark's percentile_approx underneath; `resolution` maps to
    // accuracy (Druid default 50 buckets ≈ the builtin default here)
    fn("approx_quantile", args => {
      arity(args, "approx_quantile(col, prob[, resolution])", 2, 3)
      val prob = doubleLit(args(1), "approx_quantile prob")
      require(prob >= 0.0 && prob <= 1.0, s"prob must be in [0,1], got $prob")
      val acc = if (args.length == 3) intLit(args(2), "resolution") else 10000
      ex(percentile_approx(asCol(args(0)).cast("double"), lit(prob), lit(acc)))
    }),

    fn("approx_quantile_ds", args => {
      arity(args, "approx_quantile_ds(col, prob[, k])", 2, 3)
      val prob = doubleLit(args(1), "approx_quantile_ds prob")
      require(prob >= 0.0 && prob <= 1.0, s"prob must be in [0,1], got $prob")
      val k = if (args.length == 3) intLit(args(2), "k") else 128 // Druid default
      val agg = HistSketchAgg(ex(asCol(args(0)).cast("double")), k)
        .toAggregateExpression()
      ex(element_at(asCol(HistQuantiles(agg, CreateArray(Seq(Literal(prob))))), 1))
    }),

    // DS_RANK / DS_CDF / DS_HISTOGRAM (DataSketches quantile-family SQL):
    // aggregate the column into the engine's centroid sketch, finalize with
    // the rank/CDF/PMF readers. Inclusive ranks; CDF appends the trailing
    // 1.0; histogram returns counts per (prev, split] bin (inclusive, so
    // histogram partial sums equal CDF·N at each split). A trailing
    // integer-literal k is accepted (engine superset — Druid pins the
    // default) so oracles can pin the exact regime.
    fn("ds_rank", args => {
      arity(args, "ds_rank(col, x[, k])", 2, 3)
      val x = doubleLit(args(1), "ds_rank x")
      val k = if (args.length == 3) intLit(args(2), "k") else 128
      val agg = HistSketchAgg(ex(asCol(args(0)).cast("double")), k)
        .toAggregateExpression()
      ex(element_at(asCol(HistRanks(agg, CreateArray(Seq(Literal(x))))), 1))
    }),

    fn("ds_cdf", args => {
      require(args.length >= 2, "ds_cdf(col, split1[, split2…]) needs ≥1 split")
      val splits = args.drop(1).map(doubleLit(_, "ds_cdf split"))
      val agg = HistSketchAgg(ex(asCol(args(0)).cast("double")), 128)
        .toAggregateExpression()
      ex(concat(asCol(HistRanks(agg,
        CreateArray(splits.map(Literal(_))))), array(lit(1.0))))
    }),

    fn("ds_histogram", args => {
      require(args.length >= 2,
        "ds_histogram(col, split1[, split2…]) needs ≥1 split")
      val splits = args.drop(1).map(doubleLit(_, "ds_histogram split"))
      val agg = HistSketchAgg(ex(asCol(args(0)).cast("double")), 128)
        .toAggregateExpression()
      ex(asCol(HistPmf(agg, CreateArray(splits.map(Literal(_))))))
    }),

    // STRING_FORMAT: Druid's java String.format scalar — Spark's
    // format_string IS java.util.Formatter, identical semantics
    fn("string_format", args => {
      require(args.nonEmpty, "string_format(pattern, args…) needs a pattern")
      val pattern = strLit(args(0), "string_format pattern")
      ex(format_string(pattern, args.drop(1).map(asCol): _*))
    }),

    // -------------------------------------------- multi-value (MV_*) family
    // Druid's multi-value string dims are the engine's SORTED_ARRAY columns
    // (Pipeline multi-value handling); MV_* maps onto Spark array functions.
    fn("mv_length", args => {
      arity(args, "mv_length(arr)", 1, 1)
      ex(size(asCol(args(0))))
    }),

    fn("mv_contains", args => {
      arity(args, "mv_contains(arr, value-or-array)", 2, 2)
      // ARRAY second argument = "contains ALL of" (Druid's rule)
      if (isArrayArg(args(1)))
        ex(size(array_except(asCol(args(1)), asCol(args(0)))) === 0)
      else ex(array_contains(asCol(args(0)), asCol(args(1))))
    }),

    fn("mv_overlap", args => {
      arity(args, "mv_overlap(arr, value-or-array)", 2, 2)
      if (isArrayArg(args(1)))
        ex(arrays_overlap(asCol(args(0)), asCol(args(1))))
      else ex(array_contains(asCol(args(0)), asCol(args(1))))
    }),

    fn("mv_offset", args => {
      arity(args, "mv_offset(arr, i)", 2, 2)
      // 0-based, null out of bounds — Spark `get` has exactly those semantics
      ex(get(asCol(args(0)), asCol(args(1))))
    }),

    fn("mv_ordinal", args => {
      arity(args, "mv_ordinal(arr, n)", 2, 2)
      // 1-based, null out of bounds (try_element_at, not ANSI element_at)
      ex(try_element_at(asCol(args(0)), asCol(args(1))))
    }),

    fn("mv_offset_of", args => {
      arity(args, "mv_offset_of(arr, value)", 2, 2)
      val pos = array_position(asCol(args(0)), asCol(args(1)))
      ex(when(pos === 0, lit(null)).otherwise(pos - 1).cast("long"))
    }),

    fn("mv_ordinal_of", args => {
      arity(args, "mv_ordinal_of(arr, value)", 2, 2)
      val pos = array_position(asCol(args(0)), asCol(args(1)))
      ex(when(pos === 0, lit(null)).otherwise(pos).cast("long"))
    }),

    fn("mv_to_string", args => {
      arity(args, "mv_to_string(arr, delimiter)", 2, 2)
      ex(array_join(asCol(args(0)), strLit(args(1), "mv_to_string delimiter")))
    }),

    fn("string_to_mv", args => {
      arity(args, "string_to_mv(str, delimiter)", 2, 2)
      ex(split(asCol(args(0)), strLit(args(1), "string_to_mv delimiter")))
    }),

    // Druid's MV_TO_ARRAY converts a multi-value STRING dim to an ARRAY —
    // in this engine multi-value dims already ARE arrays
    // (Pipeline.explodeMultiValueDim / the MV builders above), so the
    // conversion is the identity; it exists so verbatim Druid SQL
    // (`CROSS JOIN UNNEST(MV_TO_ARRAY(dim))`) runs unmodified
    fn("mv_to_array", args => {
      arity(args, "mv_to_array(arr)", 1, 1)
      ex(asCol(args(0)))
    }),

    // multi-value filters: keep / drop elements named in the allowed array
    // (lambda filter, not array_intersect — Druid preserves duplicates)
    fn("mv_filter_only", args => {
      arity(args, "mv_filter_only(arr, allowed)", 2, 2)
      ex(filter(asCol(args(0)), x => array_contains(asCol(args(1)), x)))
    }),

    fn("mv_filter_none", args => {
      arity(args, "mv_filter_none(arr, disallowed)", 2, 2)
      ex(filter(asCol(args(0)), x => !array_contains(asCol(args(1)), x)))
    }),

    // MV_APPEND/PREPEND/CONCAT: array builders (Druid's ARRAY_* aliases) —
    // plain Catalyst Concat, null array → null like Druid
    fn("mv_append", args => {
      arity(args, "mv_append(arr, expr)", 2, 2)
      ex(concat(asCol(args(0)), array(asCol(args(1)))))
    }),
    fn("mv_prepend", args => {
      arity(args, "mv_prepend(expr, arr)", 2, 2)
      ex(concat(array(asCol(args(0))), asCol(args(1))))
    }),
    fn("mv_concat", args => {
      arity(args, "mv_concat(arr1, arr2)", 2, 2)
      ex(concat(asCol(args(0)), asCol(args(1))))
    }),

    // MV_SLICE(arr, start[, end]): 0-based start inclusive → end exclusive
    // (end defaults to length). Druid's ARRAY_SLICE contract: null when
    // start < 0, start > length, or start > end; an end PAST the length
    // pads with nulls (Arrays.copyOfRange semantics), it does not null
    // the row. Spark's slice is 1-based with a length; the pad element
    // is a same-typed null via an out-of-bounds try_element_at
    fn("mv_slice", args => {
      arity(args, "mv_slice(arr, start[, end])", 2, 3)
      val arr = asCol(args(0))
      val st = asCol(args(1)).cast("int")
      val en = (if (args.length == 3) asCol(args(2)) else size(arr)).cast("int")
      val valid = st >= 0 && en >= st && st <= size(arr)
      val taken = slice(arr, st + 1, greatest(least(en, size(arr)) - st, lit(0)))
      val pad = array_repeat(try_element_at(arr, lit(Int.MaxValue)),
        greatest(en - size(arr), lit(0)))
      ex(when(valid, concat(taken, pad)))
    }),

    // ------------------------------------------------------- misc Druid SQL
    fn("safe_divide", args => {
      arity(args, "safe_divide(x, y)", 2, 2)
      val (x, y) = (asCol(args(0)), asCol(args(1)))
      ex(when(y === 0, lit(null)).otherwise(x / y))
    }),

    // NOTE deliberately NOT registered: DIV — Spark 4's FunctionRegistry
    // already ships a builtin `div` → IntegralDivide with exactly Druid's
    // truncate-toward-zero semantics; shadowing a builtin is the
    // STRING_AGG mistake (see the closing note).

    // bitwise family: Druid's function forms of Spark's operators. Shifts
    // cast the base to LONG first — Druid shifts are always 64-bit, while
    // Spark's shiftleft/shiftright keep int32 semantics (shift amount
    // mod 32, 32-bit overflow) on integer inputs.
    fn("bitwise_and", args => {
      arity(args, "bitwise_and(x, y)", 2, 2)
      ex(asCol(args(0)).bitwiseAND(asCol(args(1))))
    }),
    fn("bitwise_or", args => {
      arity(args, "bitwise_or(x, y)", 2, 2)
      ex(asCol(args(0)).bitwiseOR(asCol(args(1))))
    }),
    fn("bitwise_xor", args => {
      arity(args, "bitwise_xor(x, y)", 2, 2)
      ex(asCol(args(0)).bitwiseXOR(asCol(args(1))))
    }),
    fn("bitwise_complement", args => {
      arity(args, "bitwise_complement(x)", 1, 1)
      ex(bitwise_not(asCol(args(0))))
    }),
    fn("bitwise_shift_left", args => {
      arity(args, "bitwise_shift_left(x, n)", 2, 2)
      UnresolvedFunction("shiftleft",
        Seq(ex(asCol(args(0)).cast("long")), args(1)), isDistinct = false)
    }),
    fn("bitwise_shift_right", args => {
      arity(args, "bitwise_shift_right(x, n)", 2, 2)
      UnresolvedFunction("shiftright",
        Seq(ex(asCol(args(0)).cast("long")), args(1)), isDistinct = false)
    }),

    // TEXTCAT(a, b): legacy two-arg concat; STRPOS: 1-based position,
    // 0 when absent — both exactly Spark's concat/instr
    fn("textcat", args => {
      arity(args, "textcat(a, b)", 2, 2)
      ex(concat(asCol(args(0)).cast(StringType), asCol(args(1)).cast(StringType)))
    }),
    fn("strpos", args => {
      arity(args, "strpos(haystack, needle)", 2, 2)
      UnresolvedFunction("instr", args, isDistinct = false)
    }),

    // CONTAINS_STRING / ICONTAINS_STRING: substring membership with a
    // LITERAL needle (Druid's contract — its macro requires one too); null
    // haystack → null, like Druid's SQL-compatible mode. Compiles to
    // instr > 0 — codegen'd, and Catalyst can't do worse than Druid's scan
    fn("contains_string", args => {
      arity(args, "contains_string(haystack, needle)", 2, 2)
      val needle = strLit(args(1), "contains_string needle")
      ex(instr(asCol(args(0)).cast(StringType), needle) > 0)
    }),
    fn("icontains_string", args => {
      arity(args, "icontains_string(haystack, needle)", 2, 2)
      val needle = strLit(args(1), "icontains_string needle")
      // BOTH sides lowercase through Spark's own lower() (the needle
      // constant-folds) — a driver-side Locale.ROOT toLowerCase could
      // disagree with UTF8String's JVM-default-locale path on
      // locale-sensitive characters (tr dotted/dotless i)
      ex(lower(asCol(args(0)).cast(StringType))
        .contains(lower(lit(needle))))
    }),

    // DECODE_BASE64_UTF8: base64 → UTF-8 string (Spark's RFC-2045 decoder
    // skips illegal characters rather than throwing — same lenient shape)
    fn("decode_base64_utf8", args => {
      arity(args, "decode_base64_utf8(s)", 1, 1)
      ex(unbase64(asCol(args(0)).cast(StringType)).cast(StringType))
    }),

    // HUMAN_READABLE_* formats: Druid's HumanReadableBytes.format — pick
    // the largest unit whose divisor ≤ |value|, then "%.Pf <unit><suffix>"
    // (precision literal 0..3, default 2; value formats with decimals even
    // in the unit-less bucket: 500 → "500.00 B"). A 7-branch when-chain
    // over literal thresholds — no float log near bucket boundaries.
    fn("human_readable_binary_byte_format", args =>
      humanReadable(args, "human_readable_binary_byte_format", 1024L, "B")),
    fn("human_readable_decimal_byte_format", args =>
      humanReadable(args, "human_readable_decimal_byte_format", 1000L, "B")),
    fn("human_readable_decimal_format", args =>
      humanReadable(args, "human_readable_decimal_format", 1000L, "")),

    // TRUNCATE(x[, digits]): numeric truncation TOWARD ZERO at `digits`
    // decimal places (negative digits truncate left of the point); the
    // long-cast roundtrip is Druid's own truncation idiom. NOTE: TRUNC is
    // deliberately NOT aliased — Spark ships a builtin `trunc` (date
    // truncation) and shadowing it is the STRING_AGG mistake.
    fn("truncate", args => {
      arity(args, "truncate(x[, digits])", 1, 2)
      val digits =
        if (args.length == 2) intLit(args(1), "truncate digits") else 0
      require(digits >= -18 && digits <= 18,
        s"truncate digits must be in [-18, 18], got $digits")
      val x = asCol(args(0)).cast("double")
      // the scale factor stays an exact power-of-ten on both branches
      // (never a 0.1-style fraction), so the only inexact step is the one
      // scaling multiply/divide — same shape an oracle twin reproduces.
      // The double→long truncation is a TRY cast: NaN/Infinity and
      // magnitudes past Long.MaxValue yield null instead of an ANSI
      // throw (the engine's non-strict scalar convention)
      if (digits >= 0) {
        val f = math.pow(10, digits)
        ex(tryCastLong(x * f).cast("double") / f.toLong)
      } else {
        val f = math.pow(10, -digits)
        ex(tryCastLong(x / f).cast("double") * f)
      }
    }),

    // PARSE_LONG(s[, radix]): null on unparseable (Druid's non-strict
    // mode — no ANSI throw). Radix 10 = TRY cast; radix 16 accepts a sign
    // and an optional 0x prefix, up to 16 hex digits, and validates before
    // conv (conv itself would parse garbage as 0); a magnitude past
    // Long.MaxValue nulls through the TRY cast (one edge vs Java:
    // -0x8000000000000000 exactly is null here, not Long.MinValue)
    fn("parse_long", args => {
      arity(args, "parse_long(s[, radix])", 1, 2)
      val s = asCol(args(0)).cast(StringType)
      val radix =
        if (args.length == 2) intLit(args(1), "parse_long radix") else 10
      radix match {
        case 10 => ex(tryCastLong(s))
        case 16 =>
          val hex = regexp_replace(s, "^[-]?(0[xX])?", "")
          val mag = when(hex.rlike("^[0-9a-fA-F]{1,16}$"),
            tryCastLong(conv(hex, 16, 10)))
          ex(when(s.rlike("^-"), -mag).otherwise(mag))
        case other => throw new IllegalArgumentException(
          s"parse_long radix $other not supported (10, 16)")
      }
    }),

    // IPv4 family: dotted-quad ↔ unsigned-int, CIDR membership. All pure
    // Column arithmetic (codegen'd); invalid inputs → null, like Druid.
    fn("ipv4_parse", args => {
      arity(args, "ipv4_parse(s)", 1, 1)
      // Druid passes through an integer argument that is already a valid
      // IPv4; a numeric string is never dotted, so the branches are disjoint
      val s = asCol(args(0)).cast(StringType)
      ex(coalesce(ipv4ToLong(s), ipv4Range(tryCastLong(s))))
    }),
    fn("ipv4_stringify", args => {
      arity(args, "ipv4_stringify(n)", 1, 1)
      val n = asCol(args(0)).cast("long")
      val valid = n.isNotNull && n >= 0L && n <= 4294967295L
      ex(when(valid, concat_ws(".",
        shiftright(n, 24).bitwiseAND(lit(255L)),
        shiftright(n, 16).bitwiseAND(lit(255L)),
        shiftright(n, 8).bitwiseAND(lit(255L)),
        n.bitwiseAND(lit(255L)))))
    }),
    // subnet is a CIDR string LITERAL (Druid's contract): base and mask
    // fold at analysis, the row side is one AND + compare
    fn("ipv4_match", args => {
      arity(args, "ipv4_match(addr, 'a.b.c.d/n')", 2, 2)
      val cidr = strLit(args(1), "ipv4_match subnet")
      val (baseStr, bitsStr) = cidr.split("/") match {
        case Array(b, m) => (b, m)
        case _ => throw new IllegalArgumentException(
          s"ipv4_match subnet must be CIDR 'a.b.c.d/n', got '$cidr'")
      }
      val bits = bitsStr.toIntOption.filter(b => b >= 0 && b <= 32).getOrElse(
        throw new IllegalArgumentException(
          s"ipv4_match mask bits must be 0..32, got '$bitsStr'"))
      val octets = baseStr.split("\\.")
      require(octets.length == 4 && octets.forall(o =>
        o.toIntOption.exists(v => v >= 0 && v <= 255)),
        s"ipv4_match subnet base '$baseStr' is not a dotted quad")
      val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
      val base = octets.map(_.toLong).reduce(_ * 256 + _) & mask
      // addr may be the dotted string or the already-parsed number — the
      // string form is tried first (a numeric string is never dotted, so
      // the coalesce branches are disjoint); dataType is NOT inspected
      // (children may be unresolved while builders run). Out-of-range
      // numerics are INVALID (null), never masked into a spurious match.
      val addrStr = asCol(args(0)).cast(StringType)
      val addr = coalesce(ipv4ToLong(addrStr), ipv4Range(tryCastLong(addrStr)))
      ex(addr.bitwiseAND(lit(mask)) === lit(base))
    }),

    // IPV6_MATCH (Druid's IPv6 CIDR containment): the subnet literal parses
    // ONCE at analysis into 128-bit base+mask halves folded into a codegen
    // Expression ([[Ipv6Match]]); the row side is one pure textual parse
    // (never InetAddress — no DNS fallback) + two AND-compares. Malformed
    // addresses are null, like ipv4_match's out-of-range rule.
    fn("ipv6_match", args => {
      arity(args, "ipv6_match(addr, 'subnet/bits')", 2, 2)
      val cidr = strLit(args(1), "ipv6_match subnet")
      val (baseStr, bitsStr) = cidr.split("/") match {
        case Array(b, m) => (b, m)
        case _ => throw new IllegalArgumentException(
          s"ipv6_match subnet must be CIDR 'addr/bits', got '$cidr'")
      }
      val bits = bitsStr.toIntOption.filter(b => b >= 0 && b <= 128).getOrElse(
        throw new IllegalArgumentException(
          s"ipv6_match mask bits must be 0..128, got '$bitsStr'"))
      val parsed = Ipv6Util.parse(baseStr)
      require(parsed != null,
        s"ipv6_match subnet base '$baseStr' is not a valid IPv6 address")
      val (hiMask, loMask) = Ipv6Util.masks(bits)
      Ipv6Match(
        ex(asCol(args(0)).cast(StringType)),
        parsed(0) & hiMask, parsed(1) & loMask, hiMask, loMask)
    }),

    // LATEST/EARLIEST aggregates: value at max/min __time (Druid reads the
    // time column implicitly; a maxBytes second argument is accepted and
    // ignored — Spark strings are unbounded). LATEST_BY/EARLIEST_BY take
    // the ordering column explicitly. All compile to max_by/min_by.
    fn("latest", args => {
      arity(args, "latest(expr[, maxBytes])", 1, 2)
      ex(max_by(asCol(args(0)),
        asCol(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("__time"))))
    }),

    fn("earliest", args => {
      arity(args, "earliest(expr[, maxBytes])", 1, 2)
      ex(min_by(asCol(args(0)),
        asCol(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("__time"))))
    }),

    fn("latest_by", args => {
      arity(args, "latest_by(expr, timeCol[, maxBytes])", 2, 3)
      ex(max_by(asCol(args(0)), asCol(args(1))))
    }),

    fn("earliest_by", args => {
      arity(args, "earliest_by(expr, timeCol[, maxBytes])", 2, 3)
      ex(min_by(asCol(args(0)), asCol(args(1))))
    }))
    // NOTE deliberately NOT registered: STRING_AGG — Spark 4 ships it
    // natively (listagg alias) with DISTINCT and WITHIN GROUP support;
    // shadowing a built-in would change arity/semantics for every session
    // carrying graft functions. Druid's STRING_AGG(expr, sep) is
    // call-compatible with the built-in.
}
