package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.config._
import graft.pipeline.Pipeline
import graft.time.Granularity

/** Reference-parity queries: ingest-time rollup, window-period filtering,
  * schemaless projection, timestamp handling — the behaviors of SURVEY §2.2,
  * §2.4, §2.9 expressed over the `events` table. Each runs through the real
  * [[graft.pipeline.Pipeline]] (not ad-hoc DataFrame code) so the correctness
  * gate exercises the engine itself.
  */
object RollupQueries {

  private val fmtHour = "yyyy-MM-dd HH:mm:ss"

  /** Concave test pentagon for the polygon spatial bound (abscissa = lat,
    * ordinate = lon). Consecutive vertices (incl. wrap) have distinct
    * ordinates — no horizontal edge, so the ray-casting division is always
    * finite on both engines.
    */
  private val PolyXs = Seq(10.0, 90.0, 50.0, 90.0, 10.0)
  private val PolyYs = Seq(0.0, 10.0, 30.0, 60.0, 50.0)

  /** DuckDB twin of [[graft.pipeline.Filters]]' PNPOLY compilation: the same
    * per-edge literals, the same `(xj−xi)·(y−yi)/(yj−yi)+xi` association,
    * and the same XOR chain (boolean `<>`), folded left like Spark's
    * `reduce(_ =!= _)` — bit-identical crossing decisions.
    */
  private def pnpolySql(xs: Seq[Double], ys: Seq[Double],
      xc: String, yc: String): String = {
    val n = xs.size
    (0 until n).map { i =>
      val j = (i + n - 1) % n
      val (xi, yi, xj, yj) = (xs(i), ys(i), xs(j), ys(j))
      s"(($yi > $yc) <> ($yj > $yc) AND " +
        s"$xc < ($xj - $xi) * ($yc - $yi) / ($yj - $yi) + $xi)"
    }.reduce((a, b) => s"($a <> $b)")
  }

  /** spec used by several queries: count/sum/min/max by event_type. */
  private def baseSpec(qg: Granularity, rollupOn: Boolean = true) = IngestionSpec(
    DataSchema(
      dataSource = "events",
      timestampSpec = TimestampSpec(column = "ts", format = "auto"),
      dimensionsSpec = SpecificDimensions(Seq("event_type")),
      aggregators = Seq(
        AggregatorSpec("count", "cnt"),
        AggregatorSpec("doubleSum", "sum_value", Some("value")),
        AggregatorSpec("doubleMin", "min_value", Some("value")),
        AggregatorSpec("doubleMax", "max_value", Some("value"))),
      granularitySpec = GranularitySpec(Granularity.Hour, qg, rollupOn)))

  val all: Seq[QueryDef] = Seq(

    // -- core rollup at HOUR queryGranularity -------------------------------
    QueryDef("rollup_hour", (s, dir) => {
      val p = new Pipeline(baseSpec(Granularity.Hour))
      // fanOut measured a WASH here (r10 A/B min-of-8: 0.625 vs 0.622 s —
      // timestamp-normalize + truncate + partial agg is too little per-row
      // work to amortize an exchange of the raw events); the whole
      // events-rollup family is deliberately left on the bare scan
      val ev = Tables.t(s, dir, "events")
      p.rollup(p.project(p.extractTimestamp(ev)))
        .select(
          date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          round(col("sum_value"), 2).as("sum_value"),
          round(col("min_value"), 2).as("min_value"),
          round(col("max_value"), 2).as("max_value"))
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt,
             round(sum(value), 2) AS sum_value,
             round(min(value), 2) AS min_value,
             round(max(value), 2) AS max_value
            FROM events GROUP BY 1, 2"""), headline = true),

    // -- DAY granularity + exact cardinality (hyperUnique's oracle twin) ----
    QueryDef("rollup_day_distinct", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
            AggregatorSpec("exactCardinality", "uniq_users", Some("user_id"))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"), col("uniq_users"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users
            FROM events GROUP BY 1, 2""")),

    // -- Druid cardinality `fields` (byRow): distinct dimension TUPLES per
    // bucket — the exact twin oracles the struct-input plumbing the approx
    // form (hyperUnique fields) shares ------------------------------------
    QueryDef("cardinality_by_row", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Nil),
        Seq(AggregatorSpec("count", "cnt"),
            AggregatorSpec("exactCardinality", "uniq_pairs",
              fields = Seq("event_type", "user_id"))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("cnt"), col("uniq_pairs"))
    },
    Some("""WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS bucket,
                        event_type, user_id FROM events)
            SELECT strftime(b.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
                   b.cnt, CAST(u.uniq AS BIGINT) AS uniq_pairs
            FROM (SELECT date_trunc('day', ts) AS bucket, count(*) AS cnt
                  FROM events GROUP BY 1) b
            JOIN (SELECT bucket, count(*) AS uniq FROM d GROUP BY 1) u
              USING (bucket)""")),

    // -- doubleMean through the pipeline: the partial is the re-mergeable
    // (sum, count) pair; numerators rounded before the division on both
    // sides so the quotient is bit-identical cross-engine ------------------
    QueryDef("rollup_mean", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
            AggregatorSpec("doubleMean", "mean_v", Some("value"))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          round(round(col("mean_v").getField("s"), 2) /
            col("mean_v").getField("c"), 6).as("mean_value"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt,
             round(round(sum(value), 2) / count(value), 6) AS mean_value
            FROM events GROUP BY 1, 2""")),

    // -- frequent-items sketch, SPARSE-EXACT regime: distinct users (~150)
    // stay under k=256 counters so no Misra-Gries decrement ever fires —
    // counts are exact and the top-5 hash-matches the exact GROUP BY
    // (ties broken (count desc, item asc) on both sides) --------------------
    QueryDef("freq_topk_users", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(call_function("freq_sketch_agg",
          col("user_id").cast("string"), lit(256)).as("sk"))
        .select(col("event_type"),
          explode(call_function("freq_topk", col("sk"), lit(5))).as("e"))
        .select(col("event_type"), col("e.item").as("usr"), col("e.cnt").as("cnt"))
    },
    Some("""WITH c AS (SELECT event_type, CAST(user_id AS VARCHAR) AS usr,
                        count(*) AS cnt
                       FROM events GROUP BY 1, 2),
              r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY cnt DESC, usr) AS rn FROM c)
            SELECT event_type, usr, cnt FROM r WHERE rn <= 5""")),

    // -- Druid first/last aggregators through the real pipeline: the partial
    // is a (raw_ts, value) struct, min/max-ordered by (t, v) — so ties on
    // the full pair are value-identical and the output is deterministic ----
    QueryDef("rollup_first_last", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
            AggregatorSpec("doubleFirst", "first_value", Some("value")),
            AggregatorSpec("doubleLast", "last_value", Some("value")),
            AggregatorSpec("longLast", "last_user", Some("user_id"))),
        GranularitySpec(Granularity.Hour, Granularity.Hour)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          round(col("first_value").getField("v"), 2).as("first_value"),
          round(col("last_value").getField("v"), 2).as("last_value"),
          col("last_user").getField("v").as("last_user"))
    },
    Some("""WITH f AS (
              SELECT event_type, date_trunc('hour', ts) AS b, value, user_id,
                row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                  ORDER BY ts, value) AS rf,
                row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                  ORDER BY ts DESC, value DESC) AS rl,
                row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                  ORDER BY ts DESC, user_id DESC) AS ru
              FROM events)
            SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
              count(*) AS cnt,
              round(max(CASE WHEN rf = 1 THEN value END), 2) AS first_value,
              round(max(CASE WHEN rl = 1 THEN value END), 2) AS last_value,
              CAST(max(CASE WHEN ru = 1 THEN user_id END) AS BIGINT) AS last_user
            FROM f GROUP BY 1, 2""")),

    // -- fixed-width FIVE_MINUTE granularity (epoch arithmetic path) --------
    QueryDef("rollup_five_minute", (s, dir) => {
      val p = new Pipeline(baseSpec(Granularity.FiveMinute))
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(unix_timestamp(col(Pipeline.TsCol)).cast(LongType).as("bucket_epoch"),
          col("event_type"), col("cnt"), round(col("sum_value"), 2).as("sum_value"))
    },
    Some("""SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_epoch,
             event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2"""), headline = true),

    // -- filtered aggregator wrapper ----------------------------------------
    QueryDef("rollup_filtered_agg", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Nil),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("filtered", "purchase_revenue",
            filterDimension = Some("event_type"), filterValue = Some("purchase"),
            aggregator = Some(AggregatorSpec("doubleSum", "purchase_revenue", Some("value")))),
          AggregatorSpec("filtered", "purchase_cnt",
            filterDimension = Some("event_type"), filterValue = Some("purchase"),
            aggregator = Some(AggregatorSpec("count", "purchase_cnt")))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("cnt"), round(col("purchase_revenue"), 2).as("purchase_revenue"),
          col("purchase_cnt"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             count(*) AS cnt,
             round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_revenue,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_cnt
            FROM events GROUP BY 1""")),

    // -- windowPeriod accept/drop predicate (injected clock — SURVEY §2.2) --
    QueryDef("window_period_filter", (s, dir) => {
      val spec = IngestionSpec(
        DataSchema("events", TimestampSpec("ts"),
          SpecificDimensions(Seq("event_type")),
          Seq(AggregatorSpec("count", "kept")),
          GranularitySpec(Granularity.All, Granularity.All)),
        Tuning(windowPeriod = java.time.Duration.ofHours(48)))
      val p = new Pipeline(spec)
      val now = to_timestamp(lit("2024-01-15 00:00:00"))
      p.rollup(p.project(p.windowFilter(p.extractTimestamp(Tables.t(s, dir, "events")), now)))
        .select(col("event_type"), col("kept"))
    },
    Some("""SELECT event_type, count(*) AS kept FROM events
            WHERE ts >= TIMESTAMP '2024-01-13 00:00:00'
              AND ts <= TIMESTAMP '2024-01-17 00:00:00'
            GROUP BY 1""")),

    // -- schemaless dims from a JSON payload (SURVEY §2.2 / §2.8) -----------
    QueryDef("schemaless_json_dims", (s, dir) => {
      Tables.t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("k")).cast(LongType).as("sum_k"),
          count_distinct(col("k")).as("uniq_k"))
    },
    Some("""SELECT event_type, count(*) AS cnt,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS uniq_k
            FROM events GROUP BY 1""")),

    // -- spatial-dimension synthesis: fields joined into one dim ------------
    QueryDef("spatial_dim_synthesis", (s, dir) => {
      val spec = IngestionSpec(DataSchema("docs",
        TimestampSpec("ts"), SpecificDimensions(Nil,
          Seq(SpatialDimension("coord", Seq("lang", "source")))),
        Seq(AggregatorSpec("count", "cnt")),
        GranularitySpec(Granularity.All, Granularity.All)))
      // documents has no ts; synthesize a constant — spatial synth is the
      // behavior under test (concat_ws of the declared fields)
      val p = new Pipeline(spec)
      val docs = Tables.t(s, dir, "documents")
        .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      p.rollup(p.project(p.extractTimestamp(docs)))
        .select(col("coord"), col("cnt"))
    },
    Some("""SELECT concat_ws(',', lang, source) AS coord, count(*) AS cnt
            FROM documents GROUP BY 1""")),

    // -- spatial BOUND filter over a synthesized numeric spatial dim: the
    // full JSON filter DSL (SpecLoader → Filters) parses "lat,lon" back to
    // doubles and keeps cells inside the inclusive rectangle — Druid's
    // RectangularBound. The oracle filters the raw numeric pair directly
    // (no string round-trip: double→string→double is exact in Spark, and
    // grouping by the string is injective on distinct doubles, so cell
    // counts match the raw-pair grouping).
    QueryDef("spatial_bound_filter", (s, dir) => {
      val spec = IngestionSpec(DataSchema("ev",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type"),
          Seq(SpatialDimension("coord", Seq("lat", "lon")))),
        Seq(AggregatorSpec("count", "cnt")),
        GranularitySpec(Granularity.All, Granularity.All)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
        .withColumn("lat", col("value"))
        .withColumn("lon", (col("user_id") % 200).cast("double") - lit(100.0))
      val cells = p.rollup(p.project(p.extractTimestamp(ev)))
      val filter = graft.config.SpecLoader.parseFilter(
        new com.fasterxml.jackson.databind.ObjectMapper().readTree("""
          {"type": "spatial", "dimension": "coord",
           "bound": {"type": "rectangular",
                     "minCoords": [10.0, -50.0], "maxCoords": [60.0, 25.0]}}"""))
      cells.filter(graft.pipeline.Filters.toColumn(filter))
        .groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("pts_in_box"), count(lit(1)).as("cells_in_box"))
    },
    Some("""WITH cells AS (
              SELECT event_type, value AS lat,
                     CAST(user_id % 200 AS DOUBLE) - 100.0 AS lon,
                     count(*) AS cnt
              FROM events GROUP BY 1, 2, 3)
            SELECT event_type, CAST(sum(cnt) AS BIGINT) AS pts_in_box,
             count(*) AS cells_in_box
            FROM cells
            WHERE lat >= 10.0 AND lat <= 60.0 AND lon >= -50.0 AND lon <= 25.0
            GROUP BY 1""")),

    // -- spatial POLYGON bound filter: even-odd ray casting over a concave
    // pentagon (abscissa = lat, ordinate = lon). Both engines compute the
    // IDENTICAL per-edge literal arithmetic and XOR chain (Spark `=!=` /
    // DuckDB `<>` on booleans), so the strict `<` crossing test agrees
    // bit-for-bit; consecutive vertices have distinct ordinates, so no
    // division-by-zero edge exists in either engine.
    QueryDef("spatial_polygon_filter", (s, dir) => {
      val spec = IngestionSpec(DataSchema("ev",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type"),
          Seq(SpatialDimension("coord", Seq("lat", "lon")))),
        Seq(AggregatorSpec("count", "cnt")),
        GranularitySpec(Granularity.All, Granularity.All)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
        .withColumn("lat", col("value"))
        .withColumn("lon", (col("user_id") % 200).cast("double") - lit(100.0))
      val cells = p.rollup(p.project(p.extractTimestamp(ev)))
      val filter = graft.config.SpecLoader.parseFilter(
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(s"""
          {"type": "spatial", "dimension": "coord",
           "bound": {"type": "polygon",
                     "abscissa": [${PolyXs.mkString(", ")}],
                     "ordinate": [${PolyYs.mkString(", ")}]}}"""))
      cells.filter(graft.pipeline.Filters.toColumn(filter))
        .groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("pts_in_poly"), count(lit(1)).as("cells_in_poly"))
    },
    Some(s"""WITH cells AS (
              SELECT event_type, value AS lat,
                     CAST(user_id % 200 AS DOUBLE) - 100.0 AS lon,
                     count(*) AS cnt
              FROM events GROUP BY 1, 2, 3)
            SELECT event_type, CAST(sum(cnt) AS BIGINT) AS pts_in_poly,
             count(*) AS cells_in_poly
            FROM cells
            WHERE ${pnpolySql(PolyXs, PolyYs, "lat", "lon")}
            GROUP BY 1""")),

    // -- timestampSpec formats: posix + millis round-trip -------------------
    QueryDef("timestamp_formats", (s, dir) => {
      val ev = Tables.t(s, dir, "events")
        .withColumn("posix_s", unix_timestamp(col("ts")))
        .withColumn("millis", unix_millis(col("ts").cast("timestamp")))
      val posixSpec = IngestionSpec(DataSchema("e", TimestampSpec("posix_s", "posix"),
        SpecificDimensions(Nil), Nil))
      val millisSpec = IngestionSpec(DataSchema("e", TimestampSpec("millis", "millis"),
        SpecificDimensions(Nil), Nil))
      val p1 = new Pipeline(posixSpec).extractTimestamp(ev)
        .select(col("event_id"), date_format(col(Pipeline.TsCol), fmtHour).as("ts_posix"))
      val p2 = new Pipeline(millisSpec).extractTimestamp(ev)
        .select(col("event_id"),
          date_format(col(Pipeline.TsCol), "yyyy-MM-dd HH:mm:ss.SSS").as("ts_millis"))
      p1.join(p2, "event_id").filter(col("event_id") < 100)
        .select(col("event_id"), col("ts_posix"), col("ts_millis"))
    },
    Some("""SELECT event_id,
             strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_posix,
             strftime(date_trunc('millisecond', ts), '%Y-%m-%d %H:%M:%S.%g') AS ts_millis
            FROM events WHERE event_id < 100""")),

    // -- isRollup=false raw-append path (SURVEY §2.4) -----------------------
    QueryDef("raw_append_segments", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("doubleSum", "v", Some("value"))),
        GranularitySpec(Granularity.Hour, Granularity.None, rollup = false)),
        Tuning(partitions = 4))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .groupBy(date_format(col(Pipeline.SegmentCol), fmtHour).as("segment"))
        .agg(count(lit(1)).as("rows_in_segment"),
          round(sum(col("value")), 2).as("v"))
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS segment,
             count(*) AS rows_in_segment, round(sum(value), 2) AS v
            FROM events GROUP BY 1"""), headline = true),

    // -- HLL sketch path: approx_count_distinct (bench-only, no oracle) -----
    QueryDef("rollup_hll_approx", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("hyperUnique", "approx_users", Some("user_id"))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("approx_users"))
    }, None),

    // -- approxHistogram → percentile_approx, exploded to one scalar row per
    // quantile so the oracle gate can hash it. Accuracy is raised above 2·n at
    // gate scale, which makes the GK summary exact (no sample compresses away:
    // merge threshold 2·relErr·n < 1), so percentile_approx deterministically
    // returns the element at 1-based rank ceil(q·n) — the oracle computes the
    // same rank with a window. Production use keeps the default accuracy
    // (approx, mergeable, O(accuracy) state — the 100TB path).
    QueryDef("rollup_approx_histogram", (s, dir) => {
      val probs = Seq(0.25, 0.5, 0.75, 0.95)
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("approxHistogram", "value_hist", Some("value"),
          probabilities = probs, accuracy = Some(2_000_000))),
        GranularitySpec(Granularity.All, Granularity.All)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(col("event_type"), posexplode(col("value_hist")).as(Seq("pos", "value_q")))
        .select(col("event_type"),
          element_at(array(probs.map(lit): _*), col("pos") + 1).as("prob"),
          col("value_q"))
    },
    Some("""WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events)
            SELECT event_type, prob, value AS value_q
            FROM ranked
            CROSS JOIN (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS prob) probs
            WHERE rk = CAST(ceil(prob * n) AS BIGINT)""")),

    // -- multi-value string dimension, SET semantics (SURVEY §1.3): the
    // array dim is normalized to sorted distinct values at ingest (Druid's
    // SORTED_ARRAY) and rollup groups by the whole set. The deliberate
    // duplicate in the synthesized tags proves the dedup+sort. Output is
    // array_join'ed so the gate hashes scalars.
    QueryDef("multivalue_dim_rollup", (s, dir) => {
      val ev = Tables.t(s, dir, "events").withColumn("tags",
        array(col("event_type"), concat(lit("u"), col("user_id") % 3), col("event_type")))
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"),
        // SET semantics pinned explicitly (the engine default is Druid's
        // SORTED_ARRAY, which keeps duplicates — see multivalue_dim_handling)
        SpecificDimensions(Seq("tags"),
          multiValueHandling = Map("tags" -> "SORTED_SET")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("doubleSum", "sum_value", Some("value"))),
        GranularitySpec(Granularity.All, Granularity.All)))
      val p = new Pipeline(spec)
      p.rollup(p.project(p.extractTimestamp(ev)))
        .select(array_join(col("tags"), ",").as("tags"), col("cnt"),
          round(col("sum_value"), 2).as("sum_value"))
    },
    Some("""SELECT array_to_string(list_sort(list_distinct(
               [event_type, 'u' || CAST(user_id % 3 AS VARCHAR), event_type])), ',') AS tags,
             count(*) AS cnt, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1""")),

    // -- multi-value string dimension, PER-VALUE semantics: Druid groupBy
    // over a multi-value dim — each row contributes once per distinct value
    QueryDef("multivalue_dim_explode", (s, dir) => {
      val ev = Tables.t(s, dir, "events").withColumn("tags",
        array(col("event_type"), concat(lit("u"), col("user_id") % 3), col("event_type")))
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("tags"),
          multiValueHandling = Map("tags" -> "SORTED_SET")),
        Seq(AggregatorSpec("count", "cnt")),
        GranularitySpec(Granularity.All, Granularity.All)))
      val p = new Pipeline(spec)
      p.rollup(p.explodeMultiValueDim(p.project(p.extractTimestamp(ev)), "tags"))
        .select(col("tags").as("tag"), col("cnt"))
    },
    Some("""WITH exploded AS (SELECT unnest(list_distinct(
              [event_type, 'u' || CAST(user_id % 3 AS VARCHAR), event_type])) AS tag
            FROM events)
            SELECT tag, count(*) AS cnt FROM exploded GROUP BY 1""")),

    // -- multiValueHandling modes + typed dimension schemas (r5, Druid
    // DimensionSchema): the SAME source array projected under SORTED_ARRAY
    // (Druid's default — sorted, duplicates kept), SORTED_SET (sorted
    // distinct) and ARRAY (as ingested), plus a long-typed dimension —
    // declared in spec JSON with OBJECT-form dimension entries, so the
    // loader's DimensionSchema parse is oracle-gated too ------------------
    QueryDef("multivalue_dim_handling", (s, dir) => {
      val json =
        """{"dataSchema": {"dataSource": "events",
             "parser": {"parseSpec": {
               "timestampSpec": {"column": "ts", "format": "auto"},
               "dimensionsSpec": {"dimensions": [
                 {"name": "tags_sa", "multiValueHandling": "SORTED_ARRAY"},
                 {"name": "tags_ss", "multiValueHandling": "SORTED_SET"},
                 {"name": "tags_ar", "multiValueHandling": "ARRAY"},
                 {"name": "uid_bucket", "type": "long"}]}}},
             "transformSpec": {"transforms": [
               {"type": "expression", "name": "tags_sa",
                "expression": "array(event_type, concat('u', cast(user_id % 3 as string)), event_type)"},
               {"type": "expression", "name": "tags_ss",
                "expression": "array(event_type, concat('u', cast(user_id % 3 as string)), event_type)"},
               {"type": "expression", "name": "tags_ar",
                "expression": "array(concat('u', cast(user_id % 3 as string)), event_type)"},
               {"type": "expression", "name": "uid_bucket",
                "expression": "cast(user_id % 5 as string)"}]},
             "metricsSpec": [{"type": "count", "name": "cnt"}],
             "granularitySpec": {"segmentGranularity": "ALL", "queryGranularity": "ALL"}}}"""
      val p = new Pipeline(SpecLoaderRef.load(json))
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(array_join(col("tags_sa"), ",").as("tags_sa"),
          array_join(col("tags_ss"), ",").as("tags_ss"),
          array_join(col("tags_ar"), ",").as("tags_ar"),
          col("uid_bucket"), col("cnt"))
    },
    Some("""SELECT
              array_to_string(list_sort([event_type,
                'u' || CAST(user_id % 3 AS VARCHAR), event_type]), ',') AS tags_sa,
              array_to_string(list_sort(list_distinct([event_type,
                'u' || CAST(user_id % 3 AS VARCHAR), event_type])), ',') AS tags_ss,
              array_to_string(['u' || CAST(user_id % 3 AS VARCHAR), event_type],
                ',') AS tags_ar,
              CAST(user_id % 5 AS BIGINT) AS uid_bucket,
              count(*) AS cnt
            FROM events GROUP BY 1, 2, 3, 4""")),

    // -- streaming replay: events as a file stream → IngestStream micro-batch
    // rollup → SegmentStore merge — and the ORACLE is the plain batch SQL:
    // the streamed result must hash-match DuckDB's one-shot rollup, proving
    // stream ≡ batch regardless of micro-batch splits (SURVEY §2.9). Also a
    // bench headliner so the streaming path has a guarded plan+timing.
    QueryDef("streaming_rollup_replay", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val spec = IngestionSpec(DataSchema("events_replay",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("doubleSum", "sum_value", Some("value"))),
        GranularitySpec(Granularity.Day, Granularity.Hour)),
        // replay of historical data: window wide open, nothing drops.
        // partitions=8 → per-batch writes spread ~30 Day-segment dirs over 8
        // tasks instead of one task serializing 30 zstd file opens (~2s/batch)
        Tuning(windowPeriod = java.time.Duration.ofDays(3650), partitions = 8))
      val tmp = Scratch.dir("replay")
      // 8 staged files in ONE micro-batch (maxFilesPerTrigger=8): each
      // batch's fixed cost is the dynamic-overwrite commit of the SAME ~30
      // day-segment dirs (ReplayProfile: ~0.6 s addBatch, flat in batch
      // size), so the bench pays that commit exactly once. The >1-batch
      // merge contract this query used to double as lives in a dedicated
      // spec (StreamingSpec "per-batch partials re-merge to the batch-mode
      // rollup" + the checkpoint-restart spec); the stream≡batch hash gate
      // below is unchanged (r8 verdict #1). Staging is memoized per JVM
      // (eventsReplayShared — re-writing identical input files per repeat
      // timed the harness, not the engine; ~0.6 s warm, ReplayProfile);
      // checkpoint + out stay fresh per invocation.
      val stream = graft.sources.Sources.eventsReplayShared(s, dir,
        splits = 8, maxFilesPerTrigger = 8)
      val ingest = new graft.streaming.IngestStream(s, spec, s"$tmp/checkpoint")
      ingest.start(stream, s"$tmp/out",
        now = to_timestamp(lit("2024-01-15 00:00:00")),
        trigger = Trigger.AvailableNow())
      ingest.flushAndStop()
      graft.sink.SegmentStore.read(s, s"$tmp/out", spec)
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          round(col("sum_value"), 2).as("sum_value"))
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2"""), headline = true),

    // -- stored-sketch rollup through the real streaming store: hllSketch
    // partials written per batch, union-merged at read. At 50 distinct
    // values per group the DataSketches HLL is still in coupon (sparse)
    // mode, where the estimate is EXACT — so the full binary-sketch
    // store→merge→estimate path is hash-checkable against count(DISTINCT).
    QueryDef("rollup_hll_sketch_stored", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("hllSketch", "uniq_bucket", Some("user_bucket"))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
        .withColumn("user_bucket", col("user_id") % 50)
      val tmp = Scratch.dir("hllstore")
      // two half-stores stand in for two micro-batches of the same buckets
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 0))))), 0L)
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 1))))), 1L)
      graft.sink.SegmentStore.read(s, tmp, spec)
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"), col("uniq_bucket"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt,
             CAST(count(DISTINCT user_id % 50) AS BIGINT) AS uniq_bucket
            FROM events GROUP BY 1, 2""")),

    // -- bucketed AT-REST layout (SegmentStore.compactBucketed/readBucketed,
    // the storage-side half of §2.10): two micro-batches of day×type
    // partials compact into a store bucketed+sorted by event_type; the read
    // re-attaches the bucket layout and the per-type aggregation runs with
    // ZERO exchanges (BucketingSpec proves the plan; this entry hash-gates
    // the rollup VALUES through the full write→compact→attach→read path).
    QueryDef("rollup_bucketed_store", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("doubleSum", "v", Some("value"))),
        GranularitySpec(Granularity.Month, Granularity.Day)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
      val tmp = Scratch.dir("bktq")
      graft.sink.SegmentSink.writeMicroBatch(s"$tmp/raw")(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 0))))), 0L)
      graft.sink.SegmentSink.writeMicroBatch(s"$tmp/raw")(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 1))))), 1L)
      graft.sink.SegmentStore.compactBucketed(s, s"$tmp/raw", spec,
        s"$tmp/bkt", "graft_q_bkt", Seq("event_type"), 4)
      graft.sink.SegmentStore.readBucketed(s, s"$tmp/bkt", "graft_q_bkt")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast(LongType).as("days"),
          sum(col("cnt")).cast(LongType).as("cnt"),
          round(sum(col("v")), 2).as("v"))
    },
    Some("""SELECT event_type,
             CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS days,
             count(*) AS cnt, round(sum(value), 2) AS v
            FROM events GROUP BY 1""")),

    // -- the TASK-API route to the bucketed layout (SegmentStore.compactTask
    // — the function the HTTP compact-task handler invokes): per-batch
    // partials → hashed-partitionsSpec compaction (Druid's tuningConfig
    // analog: partitionDimensions=[event_type], numShards=4) → the
    // superseded partials dir is removed, readBucketed serves the result
    // with zero-exchange same-key plans. Values hash-gated end-to-end.
    QueryDef("rollup_bucketed_task", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("doubleMax", "vmax", Some("value"))),
        GranularitySpec(Granularity.Month, Granularity.Day)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
      val tmp = Scratch.dir("bkttask")
      graft.sink.SegmentSink.writeMicroBatch(s"$tmp/store")(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("user_id") % 2 === 0))))), 0L)
      graft.sink.SegmentSink.writeMicroBatch(s"$tmp/store")(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("user_id") % 2 === 1))))), 1L)
      val newDir = graft.sink.SegmentStore.compactTask(s, s"$tmp/store", spec,
        partitionsSpec = Some((Seq("event_type"), 4)), table = "graft_q_bkttask")
      graft.sink.SegmentStore.readBucketed(s, newDir, "graft_q_bkttask")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast(LongType).as("days"),
          sum(col("cnt")).cast(LongType).as("cnt"),
          round(max(col("vmax")), 2).as("vmax"))
    },
    Some("""SELECT event_type,
             CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS days,
             count(*) AS cnt, round(max(value), 2) AS vmax
            FROM events GROUP BY 1""")),

    // -- stored-sketch histogram through the real streaming store: centroid
    // histogram partials (binary) written per batch, hist_merge_agg at read,
    // quantiles finalized last. The metric has 40 distinct values against
    // k=64 bins, so the sketch never compacts (sparse-exact regime) and the
    // full store→merge→finalize path hash-checks against the oracle's rank
    // arithmetic. Production keeps raw doubles against k=128 (approx path).
    QueryDef("rollup_histogram_sketch_stored", (s, dir) => {
      val probs = Seq(0.25, 0.5, 0.75, 0.95)
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("histogramSketch", "value_hist", Some("user_bucket"),
            probabilities = probs, accuracy = Some(64))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
        .withColumn("user_bucket", col("user_id") % 40)
      val tmp = Scratch.dir("histstore")
      // two half-stores stand in for two micro-batches of the same buckets
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 0))))), 0L)
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 1))))), 1L)
      graft.sink.SegmentStore.read(s, tmp, spec)
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          posexplode(col("value_hist")).as(Seq("pos", "value_q")))
        .select(col("bucket"), col("event_type"), col("cnt"),
          element_at(array(probs.map(lit): _*), col("pos") + 1).as("prob"),
          col("value_q"))
    },
    Some("""WITH ranked AS (
              SELECT date_trunc('day', ts) AS bday, event_type,
                     CAST(user_id % 40 AS DOUBLE) AS v,
                     row_number() OVER (PARTITION BY date_trunc('day', ts), event_type
                                        ORDER BY user_id % 40) AS rk,
                     count(*) OVER (PARTITION BY date_trunc('day', ts), event_type) AS n
              FROM events)
            SELECT strftime(bday, '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
                   n AS cnt, prob, v AS value_q
            FROM ranked
            CROSS JOIN (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS prob) probs
            WHERE rk = CAST(ceil(prob * n) AS BIGINT)""")),

    // -- theta sketch SET ALGEBRA (r3): Druid thetaSketch's capability HLL
    // lacks — audience overlap via sketch intersection. k=4096 ≫ 150
    // distinct users/type keeps the KMV sketch sparse-exact, so estimates
    // and intersections hash-match exact DISTINCT arithmetic. At scale the
    // same query runs on stored sketch binaries (see theta_sketch_stored)
    // with bounded error instead of a second pass over raw data.
    QueryDef("theta_audience_overlap", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val sk = Tables.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(call_function("theta_sketch_agg",
          col("user_id").cast("string"), lit(4096)).as("sk"))
      val a = sk.select(col("event_type").as("etype_a"), col("sk").as("ska"))
      val b = sk.select(col("event_type").as("etype_b"), col("sk").as("skb"))
      a.join(b, col("etype_a") < col("etype_b"))
        .select(col("etype_a"), col("etype_b"),
          call_function("theta_estimate", col("ska")).cast(LongType).as("uniq_a"),
          call_function("theta_estimate", col("skb")).cast(LongType).as("uniq_b"),
          call_function("theta_intersect", col("ska"), col("skb"))
            .cast(LongType).as("overlap"),
          call_function("theta_difference", col("ska"), col("skb"))
            .cast(LongType).as("only_a"))
    },
    Some("""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
              c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS u FROM d GROUP BY 1),
              o AS (SELECT x.event_type AS ea, y.event_type AS eb,
                           CAST(count(*) AS BIGINT) AS ov
                    FROM d x JOIN d y ON x.user_id = y.user_id
                         AND x.event_type < y.event_type
                    GROUP BY 1, 2)
            -- every ordered pair, LEFT join: a disjoint pair must still
            -- appear with overlap 0, exactly as the sketch side emits it
            SELECT a.event_type AS etype_a, b.event_type AS etype_b,
                   a.u AS uniq_a, b.u AS uniq_b,
                   CAST(coalesce(o.ov, 0) AS BIGINT) AS overlap,
                   a.u - CAST(coalesce(o.ov, 0) AS BIGINT) AS only_a
            FROM c a JOIN c b ON a.event_type < b.event_type
            LEFT JOIN o ON o.ea = a.event_type AND o.eb = b.event_type""")),

    // -- filtered wrapper around a STORED sketch aggregator (Druid allows
    // `filtered` around any aggregator): purchase-only distinct users via
    // a filtered hllSketch, estimated at read — sparse-exact at 50 buckets
    QueryDef("rollup_filtered_sketch", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Nil),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("filtered", "purchase_uniq",
            filterDimension = Some("event_type"), filterValue = Some("purchase"),
            aggregator = Some(AggregatorSpec("hllSketch", "purchase_uniq",
              Some("user_bucket"))))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
        .withColumn("user_bucket", col("user_id") % 50)
      p.rollup(p.project(p.extractTimestamp(ev)))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"), col("cnt"),
          hll_sketch_estimate(col("purchase_uniq")).as("purchase_uniq"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             count(*) AS cnt,
             CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
               THEN user_id % 50 END) AS BIGINT) AS purchase_uniq
            FROM events GROUP BY 1""")),

    // -- theta sketch STORAGE form through the real streaming store: binary
    // KMV partials per batch, theta_union_agg at read, estimate last --------
    QueryDef("theta_sketch_stored", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("thetaSketch", "uniq_users", Some("user_id"),
            accuracy = Some(4096))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
      val tmp = Scratch.dir("thetastore")
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 0))))), 0L)
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 1))))), 1L)
      graft.sink.SegmentStore.read(s, tmp, spec)
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          col("uniq_users").cast(LongType).as("uniq_users"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users
            FROM events GROUP BY 1, 2""")),

    // -- ArrayOfDoubles TUPLE sketch (r6, Druid datasketches-tuple): a
    // theta-style distinct-KEY sample where every retained key carries
    // summed double metrics — one mergeable binary answers "how many
    // distinct users AND how much did they spend". k=4096 ≫ distinct
    // users/type keeps it sparse-exact, so the estimate AND the metric
    // sums hash-match exact arithmetic ------------------------------------
    QueryDef("tuple_sketch_metrics", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(call_function("tuple_sketch_agg",
          col("user_id").cast("string"),
          array(col("value").cast("double"), lit(1.0)), lit(4096)).as("sk"))
        .select(col("event_type"),
          call_function("tuple_estimate", col("sk"))
            .cast(LongType).as("uniq_users"),
          round(element_at(call_function("tuple_metrics_sum", col("sk")), 1), 2)
            .as("total_value"),
          element_at(call_function("tuple_metrics_sum", col("sk")), 2)
            .cast(LongType).as("total_events"))
    },
    Some("""SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users,
             round(sum(value), 2) AS total_value,
             CAST(count(*) AS BIGINT) AS total_events
            FROM events GROUP BY 1""")),

    // -- tuple sketch STORAGE form through the real streaming store: binary
    // (hash → summed metrics) partials per batch, tuple_union_agg at read
    // (values for common keys re-sum across batches), finalized last ------
    QueryDef("tuple_sketch_stored", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Seq("event_type")),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("arrayOfDoublesSketch", "usr", Some("user_id"),
            fields = Seq("value"), accuracy = Some(4096))),
        GranularitySpec(Granularity.Day, Granularity.Day)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
      val tmp = Scratch.dir("tuplestore")
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 0))))), 0L)
      graft.sink.SegmentSink.writeMicroBatch(tmp)(
        p.withSegment(p.rollup(p.project(p.extractTimestamp(
          ev.filter(col("event_id") % 2 === 1))))), 1L)
      graft.sink.SegmentStore.read(s, tmp, spec, finalizeSketches = false)
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          call_function("tuple_estimate", col("usr"))
            .cast(LongType).as("uniq_users"),
          round(element_at(call_function("tuple_metrics_sum", col("usr")), 1), 2)
            .as("total_value"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users,
             round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2""")),

    // -- Druid postAggregations (r3): arithmetic over FINALIZED metrics,
    // declared in the spec JSON (fieldAccess / constant / arithmetic, with
    // Druid's divide-by-zero→0 rule), applied after rollup ------------------
    QueryDef("post_aggregations", (s, dir) => {
      val json =
        """{"dataSchema": {"dataSource": "events",
             "parser": {"parseSpec": {
               "timestampSpec": {"column": "ts", "format": "auto"},
               "dimensionsSpec": {"dimensions": ["event_type"]}}},
             "metricsSpec": [{"type": "count", "name": "cnt"},
                             {"type": "doubleSum", "name": "sum_value", "fieldName": "value"}],
             "postAggregations": [
               {"type": "arithmetic", "name": "avg_value", "fn": "/",
                "fields": [{"type": "fieldAccess", "fieldName": "sum_value"},
                           {"type": "fieldAccess", "fieldName": "cnt"}]},
               {"type": "arithmetic", "name": "zero_guard", "fn": "/",
                "fields": [{"type": "fieldAccess", "fieldName": "sum_value"},
                           {"type": "arithmetic", "name": "z", "fn": "-",
                            "fields": [{"type": "fieldAccess", "fieldName": "cnt"},
                                       {"type": "fieldAccess", "fieldName": "cnt"}]}]},
               {"type": "arithmetic", "name": "scaled_cnt", "fn": "*",
                "fields": [{"type": "fieldAccess", "fieldName": "cnt"},
                           {"type": "constant", "name": "f", "value": 2.5}]}],
             "granularitySpec": {"segmentGranularity": "DAY", "queryGranularity": "DAY"}}}"""
      val p = new Pipeline(SpecLoaderRef.load(json))
      p.postAggregate(p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events")))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"),
          round(col("avg_value"), 6).as("avg_value"),
          col("zero_guard"), col("scaled_cnt"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt,
             round(sum(value) / count(*), 6) AS avg_value,
             0.0 AS zero_guard,
             count(*) * 2.5 AS scaled_cnt
            FROM events GROUP BY 1, 2""")),

    // -- Druid timeseries ZERO-FILLING (r3): a timeseries query emits every
    // bucket of the interval, zero-filled where no rows rolled up (upstream
    // timeseries semantics). Buckets come from one sequence() over the
    // table's hour bounds; the sparse rollup left-joins in (the bucket
    // frame is ~interval/granularity rows — broadcast side at any scale) ----
    QueryDef("timeseries_zero_fill", (s, dir) => {
      val spec = IngestionSpec(DataSchema("events",
        TimestampSpec("ts"), SpecificDimensions(Nil),
        Seq(AggregatorSpec("count", "cnt"),
          AggregatorSpec("doubleSum", "sum_value", Some("value"))),
        GranularitySpec(Granularity.Hour, Granularity.Hour)))
      val p = new Pipeline(spec)
      val ev = Tables.t(s, dir, "events")
      // sparse subset: ~1/997 of users → most hour buckets are EMPTY
      val rolled = p.rollup(p.project(p.extractTimestamp(
        ev.filter(col("user_id") % 997 === 0))))
      val buckets = ev
        .agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as(Pipeline.TsCol))
      buckets.join(rolled, Seq(Pipeline.TsCol), "left")
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          round(coalesce(col("sum_value"), lit(0.0)), 2).as("sum_value"))
    },
    Some("""WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS lo,
                                   date_trunc('hour', max(ts)) AS hi FROM events),
              buckets AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                          FROM bounds),
              rolled AS (SELECT date_trunc('hour', ts) AS h, count(*) AS c,
                                sum(value) AS sv
                         FROM events WHERE user_id % 997 = 0 GROUP BY 1)
            SELECT strftime(b.h, '%Y-%m-%d %H:%M:%S') AS bucket,
                   CAST(coalesce(r.c, 0) AS BIGINT) AS cnt,
                   round(coalesce(r.sv, 0), 2) AS sum_value
            FROM buckets b LEFT JOIN rolled r ON b.h = r.h""")),

    // -- config round-trip: full ingestion-spec JSON drives the pipeline ----
    // -- Druid transformSpec through the spec-JSON surface: derived columns
    // (Spark SQL expression language — documented delta) feeding BOTH a
    // dimension and an aggregator input, plus the ingest-time not(selector)
    // row filter, all declared in JSON and run by the real pipeline --------
    QueryDef("transform_spec_rollup", (s, dir) => {
      val json =
        """{"dataSchema": {"dataSource": "events",
             "parser": {"parseSpec": {
               "timestampSpec": {"column": "ts", "format": "auto"},
               "dimensionsSpec": {"dimensions": ["etype_up"]}}},
             "transformSpec": {
               "transforms": [
                 {"name": "etype_up", "expression": "upper(event_type)"},
                 {"name": "value2", "expression": "value * 2"}],
               "filter": {"type": "not",
                 "field": {"type": "selector",
                   "dimension": "event_type", "value": "error"}}},
             "metricsSpec": [{"type": "count", "name": "cnt"},
                             {"type": "doubleSum", "name": "sum2", "fieldName": "value2"}],
             "granularitySpec": {"segmentGranularity": "DAY", "queryGranularity": "DAY"}},
            "tuning": {"windowPeriod": "PT10M"}}"""
      val p = new Pipeline(SpecLoaderRef.load(json))
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("etype_up"), col("cnt"), round(col("sum2"), 2).as("sum2"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             upper(event_type) AS etype_up, count(*) AS cnt,
             round(sum(value * 2), 2) AS sum2
            FROM events WHERE event_type <> 'error' GROUP BY 1, 2""")),

    QueryDef("spec_json_roundtrip", (s, dir) => {
      val json =
        """{"dataSchema": {"dataSource": "events",
             "parser": {"parseSpec": {
               "timestampSpec": {"column": "ts", "format": "auto"},
               "dimensionsSpec": {"dimensions": ["event_type"]}}},
             "metricsSpec": [{"type": "count", "name": "cnt"},
                             {"type": "longSum", "name": "users", "fieldName": "user_id"}],
             "granularitySpec": {"segmentGranularity": "DAY", "queryGranularity": "DAY"}},
            "tuning": {"windowPeriod": "PT10M", "partitions": 2}}"""
      val p = new Pipeline(SpecLoaderRef.load(json))
      p.rollup(p.project(p.extractTimestamp(Tables.t(s, dir, "events"))))
        .select(date_format(col(Pipeline.TsCol), fmtHour).as("bucket"),
          col("event_type"), col("cnt"), col("users"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS users
            FROM events GROUP BY 1, 2"""))
  )

  /** indirection so the queries file reads clean */
  private object SpecLoaderRef {
    def load(json: String): IngestionSpec = graft.config.SpecLoader.fromJson(json)
  }
}
