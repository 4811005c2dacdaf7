package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Compiles the Druid filter DSL ([[graft.config.FilterSpec]]) to a Column.
  * Shared by ingest-time filtering ([[Pipeline.transform]] — Druid's
  * `transformSpec.filter`) and query-time filtering
  * ([[graft.queries.DruidQueryCompiler]] — the native query `filter` clause):
  * in Druid both sides speak the same DSL, so both compile through here.
  *
  * Every branch yields a NEVER-NULL boolean — Druid semantics: a null
  * dimension doesn't match selector/in/bound, and therefore DOES match
  * their `not()` complement. Spark's three-valued logic would instead
  * propagate NULL through `!` and silently drop those rows at `filter`.
  */
object Filters {

  /** Exact-name reference (join-prefixed dims carry dots) — [[Cols]]. */
  private def col(name: String): Column = Cols.exact(name)

  /** Typed-filter numeric comparison type: 23 integral digits cover the
    * full LONG range exactly, 15 fractional ≈ double precision. */
  private val NumCmpType = org.apache.spark.sql.types.DecimalType(38, 15)

  /** The exact-decimal half of a LONG-typed comparison: Some(condition)
    * when the match value is a finite decimal, applied only to rows whose
    * value fits DECIMAL(38,15) (overflow rows keep the double verdict);
    * None when the value itself is NaN/Infinity (double-only compare). */
  private def longExact(c: Column, v: String,
      cmp: (Column, Column) => Column): Option[Column] =
    scala.util.Try(new java.math.BigDecimal(v)).toOption.map { bd =>
      val cd = c.try_cast(NumCmpType)
      when(cd.isNotNull, cmp(cd, lit(bd).cast(NumCmpType))).otherwise(lit(true))
    }

  def toColumn(f: graft.config.FilterSpec): Column = f match {
    case graft.config.SelectorFilter(d, v) => col(d) <=> lit(v)
    // `isNotNull && pred` rather than `coalesce(pred, false)`: identical
    // never-NULL semantics for literal match values, but the conjunction
    // SURVIVES predicate pushdown (IsNotNull + In/StringStartsWith… reach
    // the parquet scan; a coalesce-wrapped predicate reaches nothing)
    case graft.config.InFilter(d, vs) =>
      col(d).isNotNull && col(d).isin(vs: _*)
    case graft.config.AndFilter(fs) =>
      fs.map(toColumn).reduceOption(_ && _).getOrElse(lit(true))
    case graft.config.OrFilter(fs) =>
      fs.map(toColumn).reduceOption(_ || _).getOrElse(lit(false))
    case graft.config.NotFilter(x) => !toColumn(x)
    case graft.config.RegexFilter(d, p) =>
      col(d).isNotNull && col(d).rlike(p)
    case graft.config.IntervalFilter(d, intervals) =>
      // timestamp-typed dimension (usually __time); millis literals keep the
      // comparisons pushable and timezone-independent
      val conds = intervals.map(graft.time.Intervals.parse).map { case (lo, hi) =>
        col(d) >= timestamp_millis(lit(lo)) && col(d) < timestamp_millis(lit(hi))
      }
      col(d).isNotNull && conds.reduceOption(_ || _).getOrElse(lit(false))
    case graft.config.LikeFilter(d, p) =>
      col(d).isNotNull && col(d).like(p)
    case graft.config.SearchFilter(d, v, cs) =>
      // contains; insensitive via lower() on both sides (Druid's
      // insensitive_contains) — null dim never matches
      val (lhs, needle) =
        if (cs) (col(d), lit(v))
        // Locale.ROOT: Spark's lower() is locale-independent; a default-
        // locale toLowerCase diverges under e.g. Turkish ı-dotting
        else (lower(col(d)), lit(v.toLowerCase(java.util.Locale.ROOT)))
      col(d).isNotNull && lhs.contains(needle)
    // spatial bounds over a synthesized "lat,lon" dim: split + try_cast
    // back to doubles (a malformed/short coord string yields null → never
    // matches, the DSL's null rule). All comparisons stay codegen'd
    // expressions; the conjunction survives pushdown like bound filters.
    case graft.config.SpatialRectFilter(d, lo, hi) =>
      val parts = split(col(d).cast(StringType), ",")
      val conds = lo.indices.map { i =>
        val c = try_element_at(parts, lit(i + 1)).try_cast(DoubleType)
        c.isNotNull && c >= lit(lo(i)) && c <= lit(hi(i)) // inclusive (upstream)
      }
      col(d).isNotNull && conds.reduce(_ && _)
    case graft.config.SpatialRadiusFilter(d, center, radius) =>
      val parts = split(col(d).cast(StringType), ",")
      val dist2 = center.indices.map { i =>
        val c = try_element_at(parts, lit(i + 1)).try_cast(DoubleType)
        (c - lit(center(i))) * (c - lit(center(i)))
      }.reduce(_ + _)
      col(d).isNotNull && coalesce(dist2 <= lit(radius * radius), lit(false))
    case graft.config.SpatialPolygonFilter(d, xs, ys) =>
      // even-odd ray casting (PNPOLY; upstream PolygonBound): a rightward
      // ray from (x, y) toggles inside-ness at each edge it crosses. The
      // per-edge toggle XOR-chains as boolean `=!=`, so the whole predicate
      // is one codegen'd conjunction-free expression; vertices are plan
      // literals. Degenerate horizontal edges contribute `false` (the
      // crossing guard fails; the NaN/Inf division is never compared).
      val parts = split(col(d).cast(StringType), ",")
      val x = try_element_at(parts, lit(1)).try_cast(DoubleType)
      val y = try_element_at(parts, lit(2)).try_cast(DoubleType)
      val n = xs.size
      val crossings = (0 until n).map { i =>
        val j = (i + n - 1) % n
        val (xi, yi, xj, yj) = (lit(xs(i)), lit(ys(i)), lit(xs(j)), lit(ys(j)))
        ((yi > y) =!= (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)
      }
      col(d).isNotNull && coalesce(crossings.reduce(_ =!= _), lit(false))
    case graft.config.ColumnComparisonFilter(ds) =>
      // Druid matches when ALL named columns carry the same value, nulls
      // included — exactly `<=>` chained pairwise
      ds.sliding(2).map { case Seq(a, b) => col(a) <=> col(b) }
        .reduceOption(_ && _).getOrElse(lit(true))
    case graft.config.ExpressionFilter(e) =>
      // documented dialect delta (Spark SQL); coalesce keeps the
      // never-NULL contract so not(expression) matches null-valued rows
      coalesce(expr(e).cast("boolean"), lit(false))
    case graft.config.TrueFilter()  => lit(true)
    case graft.config.FalseFilter() => lit(false)
    case graft.config.NullFilter(d) => col(d).isNull
    case graft.config.EqualityFilter(d, t, v) =>
      // typed compare. LONG requires BOTH the double comparison (the
      // baseline semantic: fractional values never truncate-match, tiny
      // non-zero values never round-match) AND, where the value fits
      // DECIMAL(38,15), the exact decimal comparison — which separates
      // longs a double compare collides above 2^53. Values outside the
      // decimal range (|x| ≥ 1e23, or NaN/Infinity match values) fall
      // back to the double verdict alone, where doubles are the exact
      // arbiter anyway. DOUBLE/FLOAT compare as double (their own
      // semantics, pushdown-erasable on double columns); try_cast-null
      // (unparseable string value) never matches; STRING compares the
      // stringified column.
      if (t == "STRING") col(d).cast(StringType) <=> lit(v)
      else if (t == "LONG") {
        val cdb = col(d).try_cast(DoubleType)
        val base = cdb.isNotNull && cdb === lit(v.toDouble)
        longExact(col(d), v, (cd, dl) => cd === dl)
          .map(base && _).getOrElse(base)
      } else {
        val c = col(d).try_cast(DoubleType)
        c.isNotNull && c === lit(v.toDouble)
      }
    case r: graft.config.TypedRangeFilter =>
      // bound-filter shape with typed ordering: lowerOpen/upperOpen true =
      // strict. Same pushdown-friendly isNotNull && range conjunction;
      // LONG bounds add the exact decimal check like equality.
      val isLong = r.matchValueType == "LONG"
      val c =
        if (r.matchValueType == "STRING") col(r.column).cast(StringType)
        else col(r.column).try_cast(DoubleType)
      def bound(v: String): Column =
        if (r.matchValueType == "STRING") lit(v) else lit(v.toDouble)
      def cond(v: String, cmp: (Column, Column) => Column): Column = {
        val base = cmp(c, bound(v))
        if (!isLong) base
        else longExact(col(r.column), v, cmp).map(base && _).getOrElse(base)
      }
      val lo = r.lower.map(v =>
        if (r.lowerOpen) cond(v, _ > _) else cond(v, _ >= _))
      val hi = r.upper.map(v =>
        if (r.upperOpen) cond(v, _ < _) else cond(v, _ <= _))
      c.isNotNull && (lo.toSeq ++ hi.toSeq).reduceOption(_ && _).getOrElse(lit(true))
    case b: graft.config.BoundFilter =>
      val c = b.ordering match {
        // try_cast, not cast: ANSI mode throws on malformed numerics — a
        // non-numeric dimension value should just not match (null → false)
        case "numeric"       => col(b.dimension).try_cast(DoubleType)
        case "lexicographic" => col(b.dimension).cast(StringType)
        case other => throw new IllegalArgumentException(
          s"bound filter ordering '$other' (supported: lexicographic/numeric)")
      }
      def bound(v: String): Column =
        if (b.ordering == "numeric") lit(v.toDouble) else lit(v)
      val lo = b.lower.map(v => if (b.lowerStrict) c > bound(v) else c >= bound(v))
      val hi = b.upper.map(v => if (b.upperStrict) c < bound(v) else c <= bound(v))
      // same pushdown-friendly shape: on a string dim the lexicographic
      // cast is a no-op Catalyst erases, so the range comparisons reach the
      // scan; try_cast-null (unparseable numeric) → isNotNull → no match
      c.isNotNull &&
        (lo.toSeq ++ hi.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Rewrite every reference to column `from` into `to`, recursively.
    * Used by the aggregation cores (DruidQueryCompiler.aggregate,
    * Pipeline.rollup): they overwrite the event-time column with its
    * granularity bucket BEFORE the aggregators run, so a filtered
    * aggregator's filter naming the time column would silently compare
    * against the truncated bucket — Druid evaluates filtered-agg filters
    * against the RAW row, which both cores preserve under
    * [[Pipeline.RawTsCol]]. (Found by NativeSqlFuzzSpec: a filtered agg
    * with an interval filter under granularity `day`/`all` matched nothing.)
    * expression filters reject the rename loudly rather than rewrite SQL. */
  def renameColumn(f: graft.config.FilterSpec, from: String,
      to: String): graft.config.FilterSpec = {
    def r(x: graft.config.FilterSpec): graft.config.FilterSpec =
      renameColumn(x, from, to)
    def n(d: String): String = if (d == from) to else d
    f match {
      case graft.config.SelectorFilter(d, v) => graft.config.SelectorFilter(n(d), v)
      case graft.config.InFilter(d, vs)      => graft.config.InFilter(n(d), vs)
      case graft.config.AndFilter(fs)        => graft.config.AndFilter(fs.map(r))
      case graft.config.OrFilter(fs)         => graft.config.OrFilter(fs.map(r))
      case graft.config.NotFilter(x)         => graft.config.NotFilter(r(x))
      case graft.config.RegexFilter(d, p)    => graft.config.RegexFilter(n(d), p)
      case graft.config.IntervalFilter(d, is) => graft.config.IntervalFilter(n(d), is)
      case graft.config.LikeFilter(d, p)     => graft.config.LikeFilter(n(d), p)
      case graft.config.SearchFilter(d, v, cs) => graft.config.SearchFilter(n(d), v, cs)
      case graft.config.SpatialRectFilter(d, lo, hi) =>
        graft.config.SpatialRectFilter(n(d), lo, hi)
      case graft.config.SpatialRadiusFilter(d, c, rad) =>
        graft.config.SpatialRadiusFilter(n(d), c, rad)
      case graft.config.SpatialPolygonFilter(d, xs, ys) =>
        graft.config.SpatialPolygonFilter(n(d), xs, ys)
      case graft.config.ColumnComparisonFilter(ds) =>
        graft.config.ColumnComparisonFilter(ds.map(n))
      case e @ graft.config.ExpressionFilter(ex) =>
        require(!dimensions(e).contains(from),
          s"an expression filter reading '$from' cannot be used where " +
            s"'$from' is rewritten (filtered aggregators under a bucketing " +
            "granularity); reference the raw time another way")
        e
      case t @ graft.config.TrueFilter()  => t
      case t @ graft.config.FalseFilter() => t
      case graft.config.NullFilter(d)     => graft.config.NullFilter(n(d))
      case graft.config.EqualityFilter(d, t, v) =>
        graft.config.EqualityFilter(n(d), t, v)
      case tr: graft.config.TypedRangeFilter => tr.copy(column = n(tr.column))
      case b: graft.config.BoundFilter       => b.copy(dimension = n(b.dimension))
    }
  }

  /** Column names a filter reads — so projection keeps them (e.g. a
    * filtered-aggregator predicate over a column that isn't a declared
    * dimension). */
  def dimensions(f: graft.config.FilterSpec): Seq[String] = f match {
    case graft.config.SelectorFilter(d, _) => Seq(d)
    case graft.config.InFilter(d, _)       => Seq(d)
    case graft.config.AndFilter(fs)        => fs.flatMap(dimensions)
    case graft.config.OrFilter(fs)         => fs.flatMap(dimensions)
    case graft.config.NotFilter(x)         => dimensions(x)
    case graft.config.RegexFilter(d, _)    => Seq(d)
    case graft.config.LikeFilter(d, _)     => Seq(d)
    case graft.config.IntervalFilter(d, _) => Seq(d)
    case b: graft.config.BoundFilter       => Seq(b.dimension)
    case graft.config.SearchFilter(d, _, _)        => Seq(d)
    case graft.config.ColumnComparisonFilter(ds)   => ds
    case graft.config.ExpressionFilter(e) =>
      // unresolved column references of the parsed expression tree
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(e)
        .collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name
        }.distinct
    case graft.config.SpatialRectFilter(d, _, _)    => Seq(d)
    case graft.config.SpatialRadiusFilter(d, _, _)  => Seq(d)
    case graft.config.SpatialPolygonFilter(d, _, _) => Seq(d)
    case graft.config.TrueFilter() | graft.config.FalseFilter() => Seq.empty
    case graft.config.NullFilter(d)              => Seq(d)
    case graft.config.EqualityFilter(d, _, _)    => Seq(d)
    case r: graft.config.TypedRangeFilter        => Seq(r.column)
  }
}
