package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Druid NATIVE QUERY JSON end-to-end: each query here is a verbatim Druid
  * query document compiled by [[DruidQueryCompiler]] and hash-matched against
  * a DuckDB twin — proving the full JSON surface (intervals, filter DSL,
  * granularity forms, virtualColumns, aggs, postAggs, having, limitSpec,
  * extraction fns, topN metric specs, scan/search/timeBoundary envelopes),
  * not just the operators underneath.
  *
  * Determinism notes (QueryDef rules): every ordering carries a unique
  * tiebreak on both sides (the compiler adds dimension-asc to topN and
  * grouping-key tiebreaks to limitSpec — mirrored in the oracle's
  * row_number/ORDER BY); double sums round before compare; exact-integer
  * divisions (longSum / count) are IEEE-deterministic so postAgg quotients
  * oracle cleanly.
  */
object DruidNativeQueries {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** dataSource resolver: testdata tables with `ts` renamed to Druid's
    * `__time`. */
  private def resolve(s: SparkSession, dir: String)(name: String): DataFrame = {
    val df = Tables.t(s, dir, name)
    if (df.columns.contains("ts")) df.withColumnRenamed("ts", "__time") else df
  }

  private def run(s: SparkSession, dir: String, json: String): DataFrame =
    DruidQueryCompiler.compile(json, resolve(s, dir))

  val all: Seq[QueryDef] = Seq(

    // -- timeseries: granularity + intervals + in-filter + postAggs ---------
    // mean_uid = longSum/cnt is an exact-integer division (IEEE-deterministic);
    // zero_div exercises Druid's `/`-yields-0-on-zero-divisor rule
    QueryDef("druid_json_timeseries", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": "day",
         "intervals": ["2024-01-05T00:00:00/2024-01-20T00:00:00"],
         "filter": {"type": "in", "dimension": "event_type",
                    "values": ["click", "view", "purchase"]},
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "doubleSum", "name": "sum_v", "fieldName": "value"},
           {"type": "longSum", "name": "sum_uid", "fieldName": "user_id"}],
         "postAggregations": [
           {"type": "arithmetic", "name": "mean_uid", "fn": "/",
            "fields": [{"type": "fieldAccess", "fieldName": "sum_uid"},
                       {"type": "fieldAccess", "fieldName": "cnt"}]},
           {"type": "arithmetic", "name": "zero_div", "fn": "/",
            "fields": [{"type": "fieldAccess", "fieldName": "cnt"},
                       {"type": "constant", "name": "z", "value": 0.0}]}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("cnt"), round(col("sum_v"), 2).as("sum_v"), col("sum_uid"),
          round(col("mean_uid"), 6).as("mean_uid"), col("zero_div"))
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             count(*) AS cnt, round(sum(value), 2) AS sum_v,
             CAST(sum(user_id) AS BIGINT) AS sum_uid,
             round(CAST(sum(user_id) AS DOUBLE) / count(*), 6) AS mean_uid,
             0.0 AS zero_div
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
              AND event_type IN ('click', 'view', 'purchase')
            GROUP BY 1""")),

    // -- timeseries context.grandTotal: the null-timestamped total row is
    // RE-AGGREGATED from the clipped input (not a re-sum of finalized
    // buckets — the mean postAgg over the total would be wrong otherwise);
    // rendered as 'TOTAL', the DuckDB twin is a GROUPING SETS lattice ------
    QueryDef("druid_json_grand_total", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": "day",
         "intervals": ["2024-01-05T00:00:00/2024-01-20T00:00:00"],
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "click"},
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "longSum", "name": "sum_uid", "fieldName": "user_id"},
           {"type": "doubleMean", "name": "mean_v", "fieldName": "value"}],
         "postAggregations": [
           {"type": "arithmetic", "name": "mean_uid", "fn": "/",
            "fields": [{"type": "fieldAccess", "fieldName": "sum_uid"},
                       {"type": "fieldAccess", "fieldName": "cnt"}]}],
         "context": {"grandTotal": true}}""")
        .select(
          coalesce(date_format(col("__time"), fmt), lit("TOTAL")).as("bucket"),
          col("cnt"), col("sum_uid"),
          round(col("mean_v"), 6).as("mean_v"),
          round(col("mean_uid"), 6).as("mean_uid"))
    },
    Some("""SELECT coalesce(strftime(date_trunc('day', ts),
                     '%Y-%m-%d %H:%M:%S'), 'TOTAL') AS bucket,
              count(*) AS cnt,
              CAST(sum(user_id) AS BIGINT) AS sum_uid,
              round(avg(value), 6) AS mean_v,
              round(CAST(sum(user_id) AS DOUBLE) / count(*), 6) AS mean_uid
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
              AND event_type = 'click'
            GROUP BY GROUPING SETS ((date_trunc('day', ts)), ())""")),

    // -- PeriodGranularity with a non-UTC timeZone (object-form
    // granularity): day buckets align to America/Los_Angeles local
    // midnight (UTC-8 in January), rendered as UTC instants — the native
    // twin of the SQL dialect's TIME_FLOOR timezone support; the DuckDB
    // oracle recomputes through ICU AT TIME ZONE (independent tzdata) ----
    QueryDef("druid_json_tz_granularity", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": {"type": "period", "period": "P1D",
                         "timeZone": "America/Los_Angeles"},
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "longSum", "name": "sum_uid", "fieldName": "user_id"}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("cnt"), col("sum_uid"))
    },
    Some("""WITH t AS (SELECT (ts AT TIME ZONE 'UTC') AS i, user_id FROM events)
            SELECT strftime((date_trunc('day', i AT TIME ZONE 'America/Los_Angeles')
                     AT TIME ZONE 'America/Los_Angeles') AT TIME ZONE 'UTC',
                     '%Y-%m-%d %H:%M:%S') AS bucket,
              count(*) AS cnt,
              CAST(sum(user_id) AS BIGINT) AS sum_uid
            FROM t GROUP BY 1""")),

    // -- ZONED dense zero-fill: P1D in LA wall-clock over an intervals
    // clause extending past the data (2024-01-30) — empty LA days come back
    // with zeroed count/longSum. The frame enumerates LABELS in wall space
    // and converts with the row side's own to_utc sandwich; the oracle
    // generates the same 22 wall labels (Jan 14 LA .. Feb 4 LA) explicitly
    // and left-joins the grouped rows. Also pins the clip/tz interplay: the
    // UTC interval start mid-LA-day leaves bucket Jan 14 partially filled.
    QueryDef("druid_json_tz_dense", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": {"type": "period", "period": "P1D",
                         "timeZone": "America/Los_Angeles"},
         "intervals": ["2024-01-15T00:00:00/2024-02-05T00:00:00"],
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "longSum", "name": "sum_uid", "fieldName": "user_id"}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("cnt"), col("sum_uid"))
    },
    Some("""WITH t AS (SELECT (ts AT TIME ZONE 'UTC') AS i, user_id FROM events
                       WHERE ts >= TIMESTAMP '2024-01-15'
                         AND ts < TIMESTAMP '2024-02-05'),
            g AS (SELECT strftime((date_trunc('day',
                      i AT TIME ZONE 'America/Los_Angeles')
                      AT TIME ZONE 'America/Los_Angeles') AT TIME ZONE 'UTC',
                      '%Y-%m-%d %H:%M:%S') AS bucket,
                    count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid
                  FROM t GROUP BY 1),
            f AS (SELECT strftime((wall AT TIME ZONE 'America/Los_Angeles')
                      AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS bucket
                  FROM (SELECT unnest(generate_series(
                          TIMESTAMP '2024-01-14 00:00:00',
                          TIMESTAMP '2024-02-04 00:00:00',
                          INTERVAL 1 DAY)) AS wall))
            SELECT f.bucket, coalesce(g.cnt, 0) AS cnt,
                   coalesce(g.sum_uid, 0) AS sum_uid
            FROM f LEFT JOIN g USING (bucket)""")),

    // -- ORIGIN-anchored dense zero-fill: PT6H buckets anchored at 03:00Z
    // (instant-space (t−o) mod w), intervals running past the data so the
    // trailing buckets zero-fill; the leading bucket (Jan 27 21:00) is
    // partially filled by the interval clip — both edges pinned. Oracle
    // recomputes the anchoring arithmetic and generates the same 25-bucket
    // frame explicitly.
    QueryDef("druid_json_origin_dense", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": {"type": "period", "period": "PT6H",
                         "origin": "2024-01-01T03:00:00"},
         "intervals": ["2024-01-28T00:00:00/2024-02-03T00:00:00"],
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "longSum", "name": "sum_uid", "fieldName": "user_id"}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("cnt"), col("sum_uid"))
    },
    Some("""WITH t AS (SELECT ts, user_id FROM events
                       WHERE ts >= TIMESTAMP '2024-01-28'
                         AND ts < TIMESTAMP '2024-02-03'),
            g AS (SELECT TIMESTAMP '2024-01-01 03:00:00' +
                    CAST(floor(date_diff('second',
                      TIMESTAMP '2024-01-01 03:00:00', ts) / 21600) AS BIGINT)
                    * INTERVAL 6 HOUR AS b,
                    count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid
                  FROM t GROUP BY 1),
            f AS (SELECT unnest(generate_series(
                    TIMESTAMP '2024-01-27 21:00:00',
                    TIMESTAMP '2024-02-02 21:00:00',
                    INTERVAL 6 HOUR)) AS b)
            SELECT strftime(f.b, '%Y-%m-%d %H:%M:%S') AS bucket,
                   coalesce(g.cnt, 0) AS cnt, coalesce(g.sum_uid, 0) AS sum_uid
            FROM f LEFT JOIN g ON f.b = g.b""")),

    // -- topN: per-DAY top-3 dimension values by count ----------------------
    // count ties across types within a day are likely — the compiler's
    // dimension-asc tiebreak is mirrored in the oracle's row_number
    QueryDef("druid_json_topn", (s, dir) => {
      run(s, dir, """
        {"queryType": "topN", "dataSource": "events",
         "granularity": "day", "dimension": "event_type", "threshold": 3,
         "metric": {"type": "numeric", "metric": "cnt"},
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "doubleSum", "name": "sum_v", "fieldName": "value"}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("event_type"), col("cnt"), round(col("sum_v"), 2).as("sum_v"))
    },
    Some("""WITH g AS (
              SELECT date_trunc('day', ts) AS d, event_type,
                     count(*) AS cnt, round(sum(value), 2) AS sum_v
              FROM events GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (PARTITION BY d
                    ORDER BY cnt DESC, event_type) AS rn FROM g)
            SELECT strftime(d, '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
                   cnt, sum_v
            FROM r WHERE rn <= 3""")),

    // -- topN inverted metric: per-week BOTTOM-2 by summed value ------------
    QueryDef("druid_json_topn_inverted", (s, dir) => {
      run(s, dir, """
        {"queryType": "topN", "dataSource": "events",
         "granularity": "week", "dimension": "event_type", "threshold": 2,
         "metric": {"type": "inverted",
                    "metric": {"type": "numeric", "metric": "cnt"}},
         "aggregations": [{"type": "count", "name": "cnt"}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("event_type"), col("cnt"))
    },
    Some("""WITH g AS (
              SELECT date_trunc('week', ts) AS d, event_type, count(*) AS cnt
              FROM events GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (PARTITION BY d
                    ORDER BY cnt ASC, event_type) AS rn FROM g)
            SELECT strftime(d, '%Y-%m-%d %H:%M:%S') AS bucket, event_type, cnt
            FROM r WHERE rn <= 2""")),

    // -- groupBy: virtualColumn + extraction dim + having + limitSpec -------
    // event-type counts at sf0.01 are all distinct (2017/2014/2006/1982/1981)
    // and the compiler adds grouping-key tiebreaks regardless
    QueryDef("druid_json_groupby", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all",
         "virtualColumns": [
           {"type": "expression", "name": "v2", "expression": "value * 2"}],
         "dimensions": [
           "event_type",
           {"type": "extraction", "dimension": "event_type",
            "outputName": "prefix",
            "extractionFn": {"type": "substring", "index": 0, "length": 2}}],
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "doubleSum", "name": "sum_v2", "fieldName": "v2"}],
         "having": {"type": "greaterThan", "aggregation": "cnt", "value": 1990},
         "limitSpec": {"type": "default", "limit": 2,
           "columns": [{"dimension": "cnt", "direction": "descending"}]}}""")
        .select(col("event_type"), col("prefix"), col("cnt"),
          round(col("sum_v2"), 2).as("sum_v2"))
    },
    Some("""SELECT event_type, substring(event_type, 1, 2) AS prefix,
             count(*) AS cnt, round(sum(value * 2), 2) AS sum_v2
            FROM events GROUP BY 1, 2
            HAVING count(*) > 1990
            ORDER BY cnt DESC LIMIT 2""")),

    // -- scan: intervals + selector filter + column projection --------------
    // limit exceeds the match count, so the unordered result set is exact
    // (pagination determinism itself is covered by scan_paginated + specs)
    QueryDef("druid_json_scan", (s, dir) => {
      run(s, dir, """
        {"queryType": "scan", "dataSource": "events",
         "intervals": ["2024-01-10T00:00:00/2024-01-12T00:00:00"],
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "purchase"},
         "columns": ["__time", "event_id", "user_id", "value"],
         "limit": 100000}""")
        .select(date_format(col("__time"), fmt).as("event_ts"),
          col("event_id"), col("user_id"), round(col("value"), 2).as("value"))
    },
    Some("""SELECT strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS event_ts,
             event_id, user_id, round(value, 2) AS value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
              AND event_type = 'purchase'""")),

    // -- select (legacy, removed upstream 0.17): raw events with per-segment
    // paging offsets; resumes mid-segment via pagingIdentifiers (fromNext
    // default) and the page CROSSES into the next day segment (the Jan-5
    // segment has 134 matching rows; resume 100 + threshold 60 spills into
    // Jan-6 offsets 0…) — the twin recomputes the synthetic day-segment ids, the
    // windowed offsets WITH THE SAME TIEBREAK ORDER, the resume predicate,
    // and the scan-direction threshold cut
    QueryDef("druid_json_select_paged", (s, dir) => {
      run(s, dir, """
        {"queryType": "select", "dataSource": "events",
         "granularity": "all",
         "intervals": ["2024-01-05T00:00:00/2024-01-09T00:00:00"],
         "filter": {"type": "in", "dimension": "event_type",
                    "values": ["click", "view"]},
         "dimensions": ["event_type"], "metrics": ["event_id", "value"],
         "pagingSpec": {"pagingIdentifiers": {"events_2024-01-05": 100},
                        "threshold": 60}}""")
        .select(col("segmentId"), col("offset"),
          date_format(col("__time"), fmt).as("event_ts"),
          col("event_type"), col("event_id"), round(col("value"), 2).as("value"))
    },
    Some("""WITH ev AS (
             SELECT 'events_' || strftime(ts, '%Y-%m-%d') AS "segmentId",
                    ts, event_type, event_id, value
             FROM events
             WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-09'
               AND event_type IN ('click', 'view')),
           num AS (
             SELECT "segmentId",
                    row_number() OVER (PARTITION BY "segmentId"
                      ORDER BY ts, event_type, event_id, value) - 1 AS "offset",
                    ts, event_type, event_id, value
             FROM ev)
           SELECT "segmentId", "offset",
                  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS event_ts,
                  event_type, event_id, round(value, 2) AS value
           FROM num
           WHERE NOT ("segmentId" = 'events_2024-01-05' AND "offset" <= 100)
           ORDER BY ts, event_type, event_id, value
           LIMIT 60""")),

    // -- select DESCENDING + fromNext=false: negative offsets resume AT the
    // identifier (caller pre-advanced it), the page crosses from the Jan-6
    // segment (122 matching rows; resume −100 leaves 23) into Jan-5 --------
    QueryDef("druid_json_select_desc", (s, dir) => {
      run(s, dir, """
        {"queryType": "select", "dataSource": "events",
         "descending": true,
         "intervals": ["2024-01-05T00:00:00/2024-01-07T00:00:00"],
         "filter": {"type": "in", "dimension": "event_type",
                    "values": ["click", "view"]},
         "dimensions": ["event_type"], "metrics": ["event_id", "value"],
         "pagingSpec": {"pagingIdentifiers": {"events_2024-01-06": -100},
                        "fromNext": false, "threshold": 50}}""")
        .select(col("segmentId"), col("offset"),
          date_format(col("__time"), fmt).as("event_ts"),
          col("event_type"), col("event_id"), round(col("value"), 2).as("value"))
    },
    Some("""WITH ev AS (
             SELECT 'events_' || strftime(ts, '%Y-%m-%d') AS "segmentId",
                    ts, event_type, event_id, value
             FROM events
             WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-07'
               AND event_type IN ('click', 'view')),
           num AS (
             SELECT "segmentId",
                    -row_number() OVER (PARTITION BY "segmentId"
                      ORDER BY ts DESC, event_type DESC, event_id DESC,
                               value DESC) AS "offset",
                    ts, event_type, event_id, value
             FROM ev)
           SELECT "segmentId", "offset",
                  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS event_ts,
                  event_type, event_id, round(value, 2) AS value
           FROM num
           WHERE NOT ("segmentId" = 'events_2024-01-06' AND "offset" > -100)
           ORDER BY ts DESC, event_type DESC, event_id DESC, value DESC
           LIMIT 50""")),

    // -- timeFormat extraction with the FULL upstream option set: timeZone
    // (formatting calendar), granularity (bucket BEFORE formatting), and
    // asMillis (epoch-millis string) — the twin renders the hour bucket in
    // New York wall clock via the ICU sandwich and recomputes the day
    // bucket's epoch millis exactly
    QueryDef("druid_json_timeformat_extraction", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
         "dimensions": [
           {"type": "extraction", "dimension": "__time", "outputName": "ny_hour",
            "extractionFn": {"type": "timeFormat", "format": "yyyy-MM-dd HH",
                             "timeZone": "America/New_York",
                             "granularity": "hour"}},
           {"type": "extraction", "dimension": "__time", "outputName": "day_ms",
            "extractionFn": {"type": "timeFormat", "asMillis": true,
                             "granularity": "day"}}],
         "aggregations": [{"type": "count", "name": "cnt"}]}""")
        .select(col("ny_hour"), col("day_ms"), col("cnt"))
    },
    Some("""SELECT strftime((date_trunc('hour', ts) AT TIME ZONE 'UTC')
                     AT TIME ZONE 'America/New_York', '%Y-%m-%d %H') AS ny_hour,
                   CAST(epoch_ms(date_trunc('day', ts)) AS VARCHAR) AS day_ms,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2""")),

    // -- timeFormat extraction with `locale` (r10) — the last timeFormat
    // option, a loud reject until the zone-aware LocaleDateFormat
    // expression existed. DuckDB's strftime is C-locale, so the twin
    // recomputes the French month / German weekday names from the month
    // and dow NUMBERS — an independent derivation of every rendered name,
    // not an echo of the formatter under test -----------------------------
    QueryDef("druid_json_timeformat_locale", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
         "dimensions": [
           {"type": "extraction", "dimension": "__time", "outputName": "fr_month",
            "extractionFn": {"type": "timeFormat", "format": "MMMM yyyy",
                             "locale": "fr", "granularity": "month"}},
           {"type": "extraction", "dimension": "__time", "outputName": "de_dow",
            "extractionFn": {"type": "timeFormat", "format": "EEEE",
                             "locale": "de"}}],
         "aggregations": [{"type": "count", "name": "cnt"}]}""")
        .select(col("fr_month"), col("de_dow"), col("cnt"))
    },
    Some("""SELECT
              CASE month(ts) WHEN 1 THEN 'janvier' WHEN 2 THEN 'février'
                WHEN 3 THEN 'mars' WHEN 4 THEN 'avril' WHEN 5 THEN 'mai'
                WHEN 6 THEN 'juin' WHEN 7 THEN 'juillet' WHEN 8 THEN 'août'
                WHEN 9 THEN 'septembre' WHEN 10 THEN 'octobre'
                WHEN 11 THEN 'novembre' ELSE 'décembre' END
                || ' ' || CAST(year(ts) AS VARCHAR) AS fr_month,
              CASE dayofweek(ts) WHEN 0 THEN 'Sonntag' WHEN 1 THEN 'Montag'
                WHEN 2 THEN 'Dienstag' WHEN 3 THEN 'Mittwoch'
                WHEN 4 THEN 'Donnerstag' WHEN 5 THEN 'Freitag'
                ELSE 'Samstag' END AS de_dow,
              count(*) AS cnt
            FROM events GROUP BY 1, 2""")),

    // -- search: insensitive_contains across dimension values ---------------
    QueryDef("druid_json_search", (s, dir) => {
      run(s, dir, """
        {"queryType": "search", "dataSource": "events",
         "granularity": "all", "searchDimensions": ["event_type"],
         "query": {"type": "insensitive_contains", "value": "UR"}}""")
        .select(col("dimension"), col("value"), col("cnt"))
    },
    Some("""SELECT 'event_type' AS dimension, event_type AS value,
             count(*) AS cnt
            FROM events WHERE contains(lower(event_type), 'ur')
            GROUP BY 2""")),

    // -- filtered aggregator with the FULL filter DSL (bound + regex) -------
    // Druid allows any query filter inside `filtered`, not just selector;
    // the same Filters compiler serves transformSpec, query filter, and here
    QueryDef("druid_json_filtered_agg", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "filtered", "name": "sum_mid",
            "filter": {"type": "bound", "dimension": "value",
                       "lower": "10", "upper": "50", "upperStrict": true,
                       "ordering": "numeric"},
            "aggregator": {"type": "doubleSum", "name": "sum_mid",
                           "fieldName": "value"}},
           {"type": "filtered", "name": "cnt_cv",
            "filter": {"type": "regex", "dimension": "event_type",
                       "pattern": "^(click|view)$"},
            "aggregator": {"type": "count", "name": "cnt_cv"}}]}""")
        .select(col("cnt"), round(col("sum_mid"), 2).as("sum_mid"), col("cnt_cv"))
    },
    Some("""SELECT count(*) AS cnt,
             round(sum(CASE WHEN value >= 10 AND value < 50 THEN value END), 2) AS sum_mid,
             count(CASE WHEN regexp_matches(event_type, '^(click|view)$') THEN 1 END) AS cnt_cv
            FROM events""")),

    // -- interval FILTER (DSL member, not the intervals clause) + expression
    // postAggregator (Spark SQL over finalized metrics — the documented
    // dialect delta); longSum/count division is IEEE-deterministic ----------
    QueryDef("druid_json_interval_expr", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": "week",
         "filter": {"type": "and", "fields": [
           {"type": "interval", "dimension": "__time",
            "intervals": ["2024-01-03T00:00:00/2024-01-17T00:00:00",
                          "2024-01-24T00:00:00/2024-01-27T00:00:00"]},
           {"type": "not", "field":
             {"type": "selector", "dimension": "event_type", "value": "error"}}]},
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "longSum", "name": "sum_uid", "fieldName": "user_id"}],
         "postAggregations": [{"type": "expression", "name": "mean_uid",
                               "expression": "round(sum_uid / cnt, 6)"}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("cnt"), col("sum_uid"), col("mean_uid"))
    },
    Some("""SELECT strftime(date_trunc('week', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid,
             round(CAST(sum(user_id) AS DOUBLE) / count(*), 6) AS mean_uid
            FROM events
            WHERE ((ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-17')
                OR (ts >= TIMESTAMP '2024-01-24' AND ts < TIMESTAMP '2024-01-27'))
              AND event_type <> 'error'
            GROUP BY 1""")),

    // -- timeBoundary (both bounds) -----------------------------------------
    QueryDef("druid_json_timeboundary", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeBoundary", "dataSource": "events"}""")
        .select(date_format(col("minTime"), fmt).as("min_time"),
          date_format(col("maxTime"), fmt).as("max_time"))
    },
    Some("""SELECT strftime(date_trunc('second', min(ts)), '%Y-%m-%d %H:%M:%S') AS min_time,
             strftime(date_trunc('second', max(ts)), '%Y-%m-%d %H:%M:%S') AS max_time
            FROM events""")),

    // -- dataSourceMetadata: max ingested event time ------------------------
    QueryDef("druid_json_datasource_metadata", (s, dir) => {
      run(s, dir, """
        {"queryType": "dataSourceMetadata", "dataSource": "events"}""")
        .select(date_format(col("maxIngestedEventTime"), fmt).as("max_ingested"))
    },
    Some("""SELECT strftime(date_trunc('second', max(ts)), '%Y-%m-%d %H:%M:%S') AS max_ingested
            FROM events""")),

    // -- groupBy subtotalsSpec: Druid's multi-grouping in one pass ----------
    // three subtotal sets ((event_type, prefix), (event_type), ()) share one
    // shuffle through Spark's grouping-sets operator; dims outside a set are
    // null (Druid's subtotal rendering). The extraction-fn dim inside a
    // subtotal proves computed dims participate in set membership.
    QueryDef("druid_json_groupby_subtotals", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all",
         "dimensions": [
           "event_type",
           {"type": "extraction", "dimension": "event_type",
            "outputName": "prefix",
            "extractionFn": {"type": "substring", "index": 0, "length": 2}}],
         "subtotalsSpec": [["event_type", "prefix"], ["event_type"], []],
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "doubleSum", "name": "sum_v", "fieldName": "value"}]}""")
        .select(col("event_type"), col("prefix"), col("cnt"),
          round(col("sum_v"), 2).as("sum_v"))
    },
    Some("""SELECT event_type, substring(event_type, 1, 2) AS prefix,
             count(*) AS cnt, round(sum(value), 2) AS sum_v
            FROM events
            GROUP BY GROUPING SETS ((event_type, substring(event_type, 1, 2)),
                                    (event_type), ())""")),

    // -- timeseries with skipEmptyBuckets=false (upstream's DEFAULT bucket
    // contract): 48 hourly buckets over two days, a selective filter makes
    // most of them empty — every bucket still emits, sums/counts zeroed ----
    QueryDef("druid_json_timeseries_dense", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": "hour",
         "intervals": ["2024-01-05T00:00:00/2024-01-07T00:00:00"],
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "purchase"},
         "context": {"skipEmptyBuckets": false},
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "longSum", "name": "su", "fieldName": "user_id"}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("cnt"), col("su"))
    },
    Some("""WITH buckets AS (
              SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                TIMESTAMP '2024-01-06 23:00:00', INTERVAL 1 HOUR)) AS b),
            agg AS (
              SELECT date_trunc('hour', ts) AS b, count(*) AS cnt,
                CAST(sum(user_id) AS BIGINT) AS su
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-07'
                AND event_type = 'purchase'
              GROUP BY 1)
            SELECT strftime(buckets.b, '%Y-%m-%d %H:%M:%S') AS bucket,
              CAST(coalesce(agg.cnt, 0) AS BIGINT) AS cnt,
              CAST(coalesce(agg.su, 0) AS BIGINT) AS su
            FROM buckets LEFT JOIN agg ON buckets.b = agg.b""")),

    // -- search + expression filters composed (r3d filter-DSL additions) ----
    QueryDef("druid_json_search_expr_filter", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all",
         "dimensions": ["event_type"],
         "filter": {"type": "and", "fields": [
           {"type": "search", "dimension": "event_type",
            "query": {"type": "contains", "value": "U"}},
           {"type": "expression", "expression": "value > 10"}]},
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "doubleSum", "name": "sv", "fieldName": "value"}]}""")
        .select(col("event_type"), col("cnt"), round(col("sv"), 2).as("sv"))
    },
    Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sv
            FROM events
            WHERE contains(lower(event_type), 'u') AND value > 10
            GROUP BY 1""")),

    // -- segmentMetadata: per-column stats in one pass ----------------------
    // restricted to string/bigint columns so min/max string rendering is
    // engine-independent (double formatting differs; the general form is
    // spec-covered)
    QueryDef("druid_json_segment_metadata", (s, dir) => {
      run(s, dir, """
        {"queryType": "segmentMetadata", "dataSource": "events",
         "columns": ["event_type", "user_id", "event_id"]}""")
    },
    Some("""SELECT 'event_type' AS "column", 'string' AS col_type,
              count(DISTINCT event_type) AS cardinality,
              CAST(min(event_type) AS VARCHAR) AS min_value,
              CAST(max(event_type) AS VARCHAR) AS max_value,
              count(*) - count(event_type) AS null_count,
              count(*) AS num_rows FROM events
            UNION ALL
            SELECT 'user_id', 'bigint', count(DISTINCT user_id),
              CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR),
              count(*) - count(user_id), count(*) FROM events
            UNION ALL
            SELECT 'event_id', 'bigint', count(DISTINCT event_id),
              CAST(min(event_id) AS VARCHAR), CAST(max(event_id) AS VARCHAR),
              count(*) - count(event_id), count(*) FROM events""")),

    // -- movingAverage: trailing 4-bucket mean over zero-filled days --------
    // the interval's first buckets average over data BEFORE the interval
    // (backward extension) and a zero-filled empty bucket would count as 0;
    // longSum + doubleMean keeps the window mean an exact-integer division
    // -- nested query dataSource (Druid sub-queries): outer aggregate over
    // an inner timeseries' RESULT — Catalyst fuses both into one job ------
    QueryDef("druid_json_nested_query", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries",
         "dataSource": {"type": "query", "query": {
           "queryType": "timeseries", "dataSource": "events",
           "granularity": "hour",
           "intervals": ["2024-01-05T00:00:00/2024-01-12T00:00:00"],
           "aggregations": [{"type": "count", "name": "cnt"}]}},
         "granularity": "all",
         "aggregations": [
           {"type": "longMax", "name": "peak", "fieldName": "cnt"},
           {"type": "longSum", "name": "total", "fieldName": "cnt"},
           {"type": "count", "name": "hours"}]}""")
        .select(col("peak"), col("total"), col("hours"))
    },
    Some("""WITH h AS (SELECT date_trunc('hour', ts) AS b, count(*) AS cnt
                       FROM events
                       WHERE ts >= TIMESTAMP '2024-01-05'
                         AND ts < TIMESTAMP '2024-01-12'
                       GROUP BY 1)
            SELECT CAST(max(cnt) AS BIGINT) AS peak,
                   CAST(sum(cnt) AS BIGINT) AS total,
                   count(*) AS hours
            FROM h""")),

    // -- join dataSource: LEFT join against an INLINE right (Druid's
    // broadcast-global rule), dotted right-prefix columns flowing through
    // dimensions AND aggregations; unmatched types keep a null label group
    // (Druid LEFT join semantics) and a null sum (sum of no rows) ----------
    QueryDef("druid_json_join_inline", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy",
         "dataSource": {"type": "join",
           "left": "events",
           "right": {"type": "inline",
             "columnNames": ["etype", "label", "weight"],
             "rows": [["click", "Click", 1], ["view", "View", 2],
                      ["purchase", "Buy", 3]]},
           "rightPrefix": "r.",
           "condition": "event_type == \"r.etype\"",
           "joinType": "LEFT"},
         "granularity": "all",
         "dimensions": [
           {"type": "default", "dimension": "r.label", "outputName": "label"}],
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "longSum", "name": "sum_w", "fieldName": "r.weight"},
           {"type": "longSum", "name": "sum_uid", "fieldName": "user_id"}]}""")
        .select(col("label"), col("cnt"), col("sum_w"), col("sum_uid"))
    },
    Some("""SELECT m.label AS label, count(*) AS cnt,
             CAST(sum(m.weight) AS BIGINT) AS sum_w,
             CAST(sum(e.user_id) AS BIGINT) AS sum_uid
            FROM events e
            LEFT JOIN (VALUES ('click', 'Click', 1), ('view', 'View', 2),
                              ('purchase', 'Buy', 3)) AS m(etype, label, weight)
              ON e.event_type = m.etype
            GROUP BY 1""")),

    // The full upstream averager surface over a SPARSE hourly series (most
    // purchase hours are empty): Mean counts empty buckets as zero with a
    // full-window denominator, MeanNoNulls excludes null buckets (the
    // doubleMax field stays null on empties — all-null window → null),
    // Mean over a POSTAGG field proves postAggs recompute after zero-fill
    // (Druid's `/`-yields-0-on-zero-divisor makes empty-bucket mean_uid 0,
    // not null), constant emits its value everywhere.
    QueryDef("druid_json_moving_average", (s, dir) => {
      run(s, dir, """
        {"queryType": "movingAverage", "dataSource": "events",
         "granularity": "hour",
         "intervals": ["2024-01-08T00:00:00/2024-01-10T00:00:00"],
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "purchase"},
         "aggregations": [
           {"type": "longSum", "name": "su", "fieldName": "user_id"},
           {"type": "count", "name": "cnt"},
           {"type": "doubleMax", "name": "mx", "fieldName": "value"}],
         "postAggregations": [
           {"type": "arithmetic", "name": "mean_uid", "fn": "/",
            "fields": [{"type": "fieldAccess", "fieldName": "su"},
                       {"type": "fieldAccess", "fieldName": "cnt"}]}],
         "averagers": [
           {"type": "doubleMean", "name": "ma4_su", "fieldName": "su",
            "buckets": 4},
           {"type": "doubleMeanNoNulls", "name": "mnn4_mx", "fieldName": "mx",
            "buckets": 4},
           {"type": "doubleMean", "name": "ma4_mu", "fieldName": "mean_uid",
            "buckets": 4},
           {"type": "constant", "name": "c5", "value": 5.0},
           {"type": "longMax", "name": "max2_cnt", "fieldName": "cnt",
            "buckets": 2}]}""")
        .select(date_format(col("__time"), fmt).as("bucket"),
          col("su"), col("cnt"), round(col("mx"), 4).as("mx"),
          round(col("mean_uid"), 6).as("mean_uid"),
          round(col("ma4_su"), 6).as("ma4_su"),
          round(col("mnn4_mx"), 6).as("mnn4_mx"),
          round(col("ma4_mu"), 6).as("ma4_mu"),
          col("c5"), col("max2_cnt"))
    },
    Some("""WITH buckets AS (
              SELECT unnest(generate_series(TIMESTAMP '2024-01-07 21:00:00',
                TIMESTAMP '2024-01-09 23:00:00', INTERVAL 1 HOUR)) AS b),
            agg AS (
              SELECT date_trunc('hour', ts) AS b,
                CAST(sum(user_id) AS BIGINT) AS su, count(*) AS cnt,
                max(value) AS mx
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-07 21:00:00'
                AND ts < TIMESTAMP '2024-01-10' AND event_type = 'purchase'
              GROUP BY 1),
            z AS (SELECT buckets.b, coalesce(su, 0) AS su,
                    coalesce(cnt, 0) AS cnt, mx,
                    CASE WHEN coalesce(cnt, 0) = 0 THEN 0.0
                         ELSE coalesce(su, 0) / coalesce(cnt, 0) END AS mean_uid
                  FROM buckets LEFT JOIN agg ON buckets.b = agg.b),
            m AS (SELECT b, su, cnt, mx, mean_uid,
                    sum(su) OVER w4 / 4.0 AS ma4_su,
                    avg(mx) OVER w4 AS mnn4_mx,
                    sum(mean_uid) OVER w4 / 4.0 AS ma4_mu,
                    5.0 AS c5,
                    max(cnt) OVER (ORDER BY b
                      ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS max2_cnt
                  FROM z
                  WINDOW w4 AS (ORDER BY b
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
            SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket, su, cnt,
              round(mx, 4) AS mx, round(mean_uid, 6) AS mean_uid,
              round(ma4_su, 6) AS ma4_su, round(mnn4_mx, 6) AS mnn4_mx,
              round(ma4_mu, 6) AS ma4_mu, c5,
              CAST(max2_cnt AS BIGINT) AS max2_cnt
            FROM m WHERE b >= TIMESTAMP '2024-01-08'""")),

    // -- unnest dataSource (r4): groupBy over an exploded array virtual
    // column — Druid's unnest emits one row PER element (no per-row
    // dedup, unlike multi-value dim grouping) and the unnestFilter prunes
    // emitted rows before the outer query sees them ----------------------
    QueryDef("druid_json_unnest", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource":
          {"type": "unnest", "base": "events",
           "virtualColumn": {"type": "expression", "name": "tag",
             "expression":
               "array(event_type, concat('u', cast(user_id % 3 as string)), event_type)"},
           "unnestFilter": {"type": "not", "field":
             {"type": "selector", "dimension": "tag", "value": "u1"}}},
         "granularity": "all",
         "dimensions": ["tag"],
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "longSum", "name": "sum_uid",
                           "fieldName": "user_id"}]}""")
        .select(col("tag"), col("cnt"), col("sum_uid"))
    },
    Some("""WITH exploded AS (SELECT unnest(
              [event_type, 'u' || CAST(user_id % 3 AS VARCHAR), event_type])
                AS tag, user_id
            FROM events)
            SELECT tag, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid
            FROM exploded WHERE tag <> 'u1' GROUP BY 1""")),

    // -- sketch post-aggregators (r5): the DataSketches-extension response
    // pipeline — filtered thetaSketch aggs, set algebra (INTERSECT / NOT /
    // UNION) as post-aggs, estimates via thetaSketchEstimate /
    // finalizingFieldAccess, arithmetic over finalized estimates, and the
    // response-time finalization of the raw agg columns. k=16384 ≫ 150
    // distinct users keeps every sketch sparse-exact, so all estimates
    // hash-match exact DISTINCT set arithmetic in DuckDB ------------------
    QueryDef("druid_json_sketch_postaggs", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [
           {"type": "filtered",
            "filter": {"type": "and", "fields": [
              {"type": "selector", "dimension": "event_type", "value": "click"},
              {"type": "bound", "dimension": "value", "lower": "150",
               "ordering": "numeric", "lowerStrict": true}]},
            "aggregator": {"type": "thetaSketch", "name": "click_hi",
                           "fieldName": "user_id", "accuracy": 16384}},
           {"type": "filtered",
            "filter": {"type": "and", "fields": [
              {"type": "selector", "dimension": "event_type", "value": "purchase"},
              {"type": "bound", "dimension": "value", "lower": "150",
               "ordering": "numeric", "lowerStrict": true}]},
            "aggregator": {"type": "thetaSketch", "name": "purch_hi",
                           "fieldName": "user_id", "accuracy": 16384}}],
         "postAggregations": [
           {"type": "thetaSketchEstimate", "name": "both",
            "field": {"type": "thetaSketchSetOp", "name": "i", "func": "INTERSECT",
              "fields": [{"type": "fieldAccess", "fieldName": "click_hi"},
                         {"type": "fieldAccess", "fieldName": "purch_hi"}]}},
           {"type": "thetaSketchEstimate", "name": "click_only",
            "field": {"type": "thetaSketchSetOp", "name": "n", "func": "NOT",
              "fields": [{"type": "fieldAccess", "fieldName": "click_hi"},
                         {"type": "fieldAccess", "fieldName": "purch_hi"}]}},
           {"type": "thetaSketchEstimate", "name": "either",
            "field": {"type": "thetaSketchSetOp", "name": "u", "func": "UNION",
              "fields": [{"type": "fieldAccess", "fieldName": "click_hi"},
                         {"type": "fieldAccess", "fieldName": "purch_hi"}]}},
           {"type": "arithmetic", "name": "est_sum", "fn": "+",
            "fields": [{"type": "finalizingFieldAccess", "fieldName": "click_hi"},
                       {"type": "finalizingFieldAccess", "fieldName": "purch_hi"}]}]}""")
        .select(col("click_hi"), col("purch_hi"), col("both").as("in_both"),
          col("click_only"), col("either"), col("est_sum"))
    },
    Some("""WITH a AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'click' AND value > 150),
                 b AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'purchase' AND value > 150)
            SELECT CAST((SELECT count(*) FROM a) AS DOUBLE) AS click_hi,
                   CAST((SELECT count(*) FROM b) AS DOUBLE) AS purch_hi,
                   CAST((SELECT count(*) FROM a JOIN b USING (user_id))
                     AS DOUBLE) AS in_both,
                   CAST((SELECT count(*) FROM a WHERE user_id NOT IN
                     (SELECT user_id FROM b)) AS DOUBLE) AS click_only,
                   CAST((SELECT count(*) FROM (SELECT user_id FROM a
                     UNION SELECT user_id FROM b)) AS DOUBLE) AS either,
                   CAST((SELECT count(*) FROM a) + (SELECT count(*) FROM b)
                     AS DOUBLE) AS est_sum""")),

    // -- alphanumeric dimension ordering (r6 s2): Druid's digit-run
    // collation (StringComparators ALPHANUMERIC) in a limitSpec
    // dimensionOrder — u0..u9 selected in NUMERIC suffix order where
    // lexicographic would pick u0,u1,u10,u11,… (a different row SET, so
    // the oracle distinguishes the collations, not just their order) ----
    QueryDef("druid_json_alphanumeric_order", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all",
         "virtualColumns": [
           {"type": "expression", "name": "tag",
            "expression": "concat('u', user_id % 25)"}],
         "dimensions": ["tag"],
         "aggregations": [{"type": "count", "name": "cnt"}],
         "limitSpec": {"type": "default", "limit": 10,
           "columns": [{"dimension": "tag", "direction": "ascending",
                        "dimensionOrder": "alphanumeric"}]}}""")
        .select(col("tag"), col("cnt"))
    },
    Some("""SELECT 'u' || CAST(user_id % 25 AS VARCHAR) AS tag,
                   count(*) AS cnt
            FROM events GROUP BY 1
            ORDER BY CAST(substr(tag, 2) AS INT) LIMIT 10""")),

    // -- ArrayOfDoubles TUPLE sketch post-aggregators (r6, the
    // datasketches-tuple extension): filtered arrayOfDoublesSketch aggs
    // (distinct users carrying summed spend), ToNumEntries /
    // ToMetricsSumEstimate finalizers, SetOp INTERSECT/NOT (summaries sum
    // for common keys), and response-time finalization of the raw agg
    // columns to their estimates. nominalEntries=16384 ≫ distinct users
    // keeps every sketch sparse-exact — estimates AND metric sums
    // hash-match exact per-user arithmetic in DuckDB ----------------------
    QueryDef("druid_json_tuple_postaggs", (s, dir) => {
      run(s, dir, """
        {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [
           {"type": "filtered",
            "filter": {"type": "selector", "dimension": "event_type",
                       "value": "click"},
            "aggregator": {"type": "arrayOfDoublesSketch", "name": "click_sk",
                           "fieldName": "user_id",
                           "metricColumns": ["value"], "numberOfValues": 1,
                           "nominalEntries": 16384}},
           {"type": "filtered",
            "filter": {"type": "selector", "dimension": "event_type",
                       "value": "purchase"},
            "aggregator": {"type": "arrayOfDoublesSketch", "name": "purch_sk",
                           "fieldName": "user_id",
                           "metricColumns": ["value"],
                           "nominalEntries": 16384}}],
         "postAggregations": [
           {"type": "arrayOfDoublesSketchToNumEntries", "name": "click_keys",
            "field": {"type": "fieldAccess", "fieldName": "click_sk"}},
           {"type": "arrayOfDoublesSketchToMetricsSumEstimate", "name": "click_sums",
            "field": {"type": "fieldAccess", "fieldName": "click_sk"}},
           {"type": "arrayOfDoublesSketchToEstimate", "name": "in_both",
            "field": {"type": "arrayOfDoublesSketchSetOp", "name": "i",
              "operation": "INTERSECT",
              "fields": [{"type": "fieldAccess", "fieldName": "click_sk"},
                         {"type": "fieldAccess", "fieldName": "purch_sk"}]}},
           {"type": "arrayOfDoublesSketchToMetricsSumEstimate", "name": "both_sums",
            "field": {"type": "arrayOfDoublesSketchSetOp", "name": "i2",
              "operation": "INTERSECT",
              "fields": [{"type": "fieldAccess", "fieldName": "click_sk"},
                         {"type": "fieldAccess", "fieldName": "purch_sk"}]}},
           {"type": "arrayOfDoublesSketchToEstimate", "name": "click_only",
            "field": {"type": "arrayOfDoublesSketchSetOp", "name": "n",
              "operation": "NOT",
              "fields": [{"type": "fieldAccess", "fieldName": "click_sk"},
                         {"type": "fieldAccess", "fieldName": "purch_sk"}]}}]}""")
        .select(col("click_sk"), col("click_keys"),
          round(element_at(col("click_sums"), 1), 2).as("click_spend"),
          col("in_both"),
          round(element_at(col("both_sums"), 1), 2).as("both_spend"),
          col("click_only"))
    },
    Some("""WITH c AS (SELECT user_id, sum(value) AS sv FROM events
                       WHERE event_type = 'click' GROUP BY 1),
                 p AS (SELECT user_id, sum(value) AS sv FROM events
                       WHERE event_type = 'purchase' GROUP BY 1)
            SELECT CAST((SELECT count(*) FROM c) AS DOUBLE) AS click_sk,
                   CAST((SELECT count(*) FROM c) AS BIGINT) AS click_keys,
                   round((SELECT sum(sv) FROM c), 2) AS click_spend,
                   CAST((SELECT count(*) FROM c JOIN p USING (user_id))
                     AS DOUBLE) AS in_both,
                   round((SELECT sum(c.sv + p.sv) FROM c
                          JOIN p USING (user_id)), 2) AS both_spend,
                   CAST((SELECT count(*) FROM c WHERE user_id NOT IN
                     (SELECT user_id FROM p)) AS DOUBLE) AS click_only""")),

    // -- quantilesDoublesSketchToQuantile(s) post-aggs (r5): the quantiles
    // sketch finalizer pipeline. k=4096 bins ≥ ~1800 distinct values per
    // event_type keeps the centroid histogram exact, so the extracted
    // quantiles are the values at rank ceil(p·n) — the same rank-window
    // rule the stored-sketch oracle uses -----------------------------------
    QueryDef("druid_json_quantile_postagg", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all", "dimensions": ["event_type"],
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "quantilesDoublesSketch", "name": "vq",
            "fieldName": "value", "k": 4096}],
         "postAggregations": [
           {"type": "quantilesDoublesSketchToQuantile", "name": "p50",
            "field": {"type": "fieldAccess", "fieldName": "vq"},
            "fraction": 0.5},
           {"type": "quantilesDoublesSketchToQuantile", "name": "p95",
            "field": {"type": "fieldAccess", "fieldName": "vq"},
            "fraction": 0.95}]}""")
        .select(col("event_type"), col("cnt"),
          round(col("p50"), 2).as("p50"), round(col("p95"), 2).as("p95"))
    },
    Some("""WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events)
            SELECT event_type, n AS cnt,
                   round(max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN value END), 2) AS p50,
                   round(max(CASE WHEN rk = CAST(ceil(0.95 * n) AS BIGINT)
                     THEN value END), 2) AS p95
            FROM ranked GROUP BY event_type, n""")),

    // -- the REST of the quantile-sketch post-agg family: ToRank (inclusive
    // normalized rank), ToCDF (ranks at splits + trailing 1.0), ToHistogram
    // (counts per (prev, split] bin — getPMF inclusive convention, so
    // hist_low == cdf_50·N: the bins reconcile with the CDF). Exact regime
    // (k=4096 ≥ ~1.8k distinct values per group), so DuckDB recomputes the
    // same numbers from exact filtered counts; fractions are exact-integer
    // divisions, IEEE-identical both engines ------------------------------
    QueryDef("druid_json_rank_cdf_histogram", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all", "dimensions": ["event_type"],
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "quantilesDoublesSketch", "name": "vq",
            "fieldName": "value", "k": 4096}],
         "postAggregations": [
           {"type": "quantilesDoublesSketchToRank", "name": "rank100",
            "field": {"type": "fieldAccess", "fieldName": "vq"}, "value": 100.0},
           {"type": "quantilesDoublesSketchToCDF", "name": "cdf",
            "field": {"type": "fieldAccess", "fieldName": "vq"},
            "splitPoints": [50.0, 200.0]},
           {"type": "quantilesDoublesSketchToHistogram", "name": "hist",
            "field": {"type": "fieldAccess", "fieldName": "vq"},
            "splitPoints": [50.0, 200.0]}]}""")
        .select(col("event_type"), col("cnt"),
          round(col("rank100"), 6).as("rank100"),
          round(element_at(col("cdf"), 1), 6).as("cdf_50"),
          round(element_at(col("cdf"), 2), 6).as("cdf_200"),
          element_at(col("cdf"), 3).as("cdf_tail"),
          element_at(col("hist"), 1).cast("long").as("hist_low"),
          element_at(col("hist"), 2).cast("long").as("hist_mid"),
          element_at(col("hist"), 3).cast("long").as("hist_high"))
    },
    Some("""SELECT event_type, count(*) AS cnt,
              round(CAST(count(*) FILTER (value <= 100.0) AS DOUBLE)
                / count(*), 6) AS rank100,
              round(CAST(count(*) FILTER (value <= 50.0) AS DOUBLE)
                / count(*), 6) AS cdf_50,
              round(CAST(count(*) FILTER (value <= 200.0) AS DOUBLE)
                / count(*), 6) AS cdf_200,
              1.0 AS cdf_tail,
              CAST(count(*) FILTER (value <= 50.0) AS BIGINT) AS hist_low,
              CAST(count(*) FILTER (value > 50.0 AND value <= 200.0) AS BIGINT)
                AS hist_mid,
              CAST(count(*) FILTER (value > 200.0) AS BIGINT) AS hist_high
            FROM events GROUP BY 1""")),

    // -- Druid 26+ TYPED filters (the SQL planner's defaults when
    // sqlUseBoundAndSelectors=false): `range` with open/closed typed ends,
    // `equality` with a LONG matchValue against a derived virtual column,
    // and `null` (the one filter that MATCHES nulls — testdata has none,
    // so a nullif() virtualColumn synthesizes them; not(null) must then
    // drop exactly the 'view' rows under the DSL's never-NULL rule) ------
    QueryDef("druid_json_typed_filters", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all", "dimensions": ["event_type"],
         "virtualColumns": [
           {"type": "expression", "name": "v_nil",
            "expression": "nullif(event_type, 'view')"},
           {"type": "expression", "name": "uid_mod",
            "expression": "user_id % 7"}],
         "filter": {"type": "and", "fields": [
           {"type": "range", "column": "value", "matchValueType": "DOUBLE",
            "lower": 10.5, "upper": 420.0, "upperOpen": true},
           {"type": "not", "field": {"type": "null", "column": "v_nil"}},
           {"type": "equality", "column": "uid_mod",
            "matchValueType": "LONG", "matchValue": 3}]},
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "doubleSum", "name": "sum_v", "fieldName": "value"}]}""")
        .select(col("event_type"), col("cnt"),
          round(col("sum_v"), 2).as("sum_v"))
    },
    Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_v
            FROM events
            WHERE value >= 10.5 AND value < 420.0
              AND nullif(event_type, 'view') IS NOT NULL
              AND user_id % 7 = 3
            GROUP BY 1""")),

    // -- the null-producing extraction fns (r7): `partial` (regex
    // find-retain), `searchQuery` (spec-accept-retain) and `time`
    // (parse-with-timeFormat → render-with-resultFormat, unparseable
    // passthrough) — each grouped on, so the null-out semantics land in a
    // visible null group rather than vanishing. The `time` input is a
    // dd/MM/yyyy virtual column derived from __time, so parse→render is a
    // pure month truncation the oracle states directly -------------------
    QueryDef("druid_json_retain_extraction_fns", (s, dir) => {
      run(s, dir, """
        {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all",
         "virtualColumns": [{"type": "expression", "name": "dmy",
           "expression": "date_format(__time, 'dd/MM/yyyy')"}],
         "dimensions": [
           {"type": "extraction", "dimension": "event_type",
            "outputName": "p",
            "extractionFn": {"type": "partial", "expr": "^(cl|pu)"}},
           {"type": "extraction", "dimension": "event_type",
            "outputName": "sq",
            "extractionFn": {"type": "searchQuery",
              "query": {"type": "insensitive_contains", "value": "E"}}},
           {"type": "extraction", "dimension": "dmy", "outputName": "ym",
            "extractionFn": {"type": "time", "timeFormat": "dd/MM/yyyy",
              "resultFormat": "yyyy-MM"}}],
         "aggregations": [
           {"type": "count", "name": "cnt"},
           {"type": "doubleSum", "name": "sum_v", "fieldName": "value"}]}""")
        .select(col("p"), col("sq"), col("ym"), col("cnt"),
          round(col("sum_v"), 2).as("sum_v"))
    },
    Some("""SELECT CASE WHEN regexp_matches(event_type, '^(cl|pu)')
                     THEN event_type END AS p,
              CASE WHEN contains(lower(event_type), 'e')
                   THEN event_type END AS sq,
              strftime(ts, '%Y-%m') AS ym,
              count(*) AS cnt, round(sum(value), 2) AS sum_v
            FROM events GROUP BY 1, 2, 3"""))
  )
}
