package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Druid SQL DIALECT end-to-end: each query here is Druid SQL text (the
  * surface a tranquility+Druid user types at `/druid/v2/sql` — upstream
  * `server/.../TranquilityServlet.scala`'s query twin, SURVEY §2.9) executed
  * through [[DruidSql.run]] — the exact code path the daemon endpoint
  * serves — and hash-matched against a DuckDB oracle.
  *
  * Sketch-function oracles use the exact regime (QueryDef rules):
  *  - DataSketches HLL (`APPROX_COUNT_DISTINCT_DS_HLL`) is exact while the
  *    sketch is in coupon mode — 150 distinct users per event_type vs
  *    lgK=14 is far below promotion;
  *  - theta (`APPROX_COUNT_DISTINCT_DS_THETA`) is exact while distinct ≤ k
  *    (KMV keeps everything);
  *  - `APPROX_QUANTILE_DS` is exact lower-rank while distinct values per
  *    group ≤ k centroids (~1.8k distinct vs k=16384) — the DuckDB twin is
  *    the ranked `rk = ceil(prob·n)` CTE, same as `rollup_approx_histogram`.
  */
object DruidSqlQueries {

  /** dataSource frames for the dialect queries: testdata tables with `ts`
    * renamed to Druid's `__time`, exposed under their table names. */
  private def frames(s: SparkSession, dir: String,
      names: String*): Map[String, DataFrame] =
    names.map { n =>
      val df = Tables.t(s, dir, n)
      n -> (if (df.columns.contains("ts")) df.withColumnRenamed("ts", "__time")
            else df)
    }.toMap

  val all: Seq[QueryDef] = Seq(

    // -- TIME_FLOOR bucketing + aggregation: the first query every Druid SQL
    // user runs. Epoch-rendered bucket (fixed-width floor is integer epoch
    // arithmetic on both sides — the rollup_five_minute idiom) -------------
    QueryDef("druid_sql_time_floor", (s, dir) => {
      DruidSql.run(
        """SELECT TIME_EXTRACT(TIME_FLOOR(__time, 'PT6H'), 'EPOCH') AS bucket_epoch,
                  event_type,
                  COUNT(*) AS cnt,
                  CAST(SUM(user_id) AS BIGINT) AS sum_uid
           FROM events
           GROUP BY 1, 2""",
        frames(s, dir, "events"))
    },
    Some("""SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket_epoch,
             event_type, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid
            FROM events GROUP BY 1, 2"""), headline = true),

    // -- time scalar family per-row: TIME_SHIFT (fixed + calendar),
    // TIME_CEIL, TIME_EXTRACT units, TIMESTAMP_TO_MILLIS / MILLIS_TO_
    // TIMESTAMP roundtrip, TIME_FORMAT pattern --------------------------
    QueryDef("druid_sql_time_scalars", (s, dir) => {
      DruidSql.run(
        """SELECT event_id,
                  TIME_FORMAT(TIME_SHIFT(__time, 'PT1H', 3), 'yyyy-MM-dd HH:mm:ss') AS shifted_3h,
                  TIME_FORMAT(TIME_SHIFT(__time, 'P1M', -1), 'yyyy-MM-dd HH:mm:ss') AS back_1mo,
                  TIME_FORMAT(TIME_CEIL(__time, 'P1D'), 'yyyy-MM-dd HH:mm:ss') AS day_ceil,
                  TIME_EXTRACT(__time, 'DOW') AS dow,
                  TIME_EXTRACT(__time, 'QUARTER') AS qtr,
                  TIMESTAMP_TO_MILLIS(__time) AS ms,
                  TIME_EXTRACT(MILLIS_TO_TIMESTAMP(TIMESTAMP_TO_MILLIS(__time)), 'EPOCH') AS epoch_s
           FROM events
           WHERE event_id % 97 = 0""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_id,
             strftime(ts + INTERVAL 3 HOUR, '%Y-%m-%d %H:%M:%S') AS shifted_3h,
             strftime(ts - INTERVAL 1 MONTH, '%Y-%m-%d %H:%M:%S') AS back_1mo,
             strftime(CASE WHEN date_trunc('day', ts) = ts THEN ts
                           ELSE date_trunc('day', ts) + INTERVAL 1 DAY END,
                      '%Y-%m-%d %H:%M:%S') AS day_ceil,
             CAST(isodow(ts) AS BIGINT) AS dow,
             CAST(quarter(ts) AS BIGINT) AS qtr,
             epoch_ms(ts) AS ms,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
            FROM events WHERE event_id % 97 = 0""")),

    // -- non-UTC timezone arguments across SEVEN YEARS of DST transitions
    // (orders 1992–1998): day/month floors bucket at America/Los_Angeles
    // local midnight (UTC offset flips -8/-7 across each transition),
    // hour floor in a half-hour zone (Asia/Kolkata +05:30) lands on :30
    // boundaries, and calendar extraction reads the local wall clock. The
    // DuckDB twin recomputes through ICU AT TIME ZONE — independent tzdata
    // path, same IANA rules -----------------------------------------------
    QueryDef("druid_sql_tz", (s, dir) => {
      DruidSql.run(
        """SELECT TIME_FORMAT(TIME_FLOOR(CAST(o_orderdate AS TIMESTAMP), 'P1D',
                    NULL, 'America/Los_Angeles'), 'yyyy-MM-dd HH:mm') AS la_day,
                  TIME_FORMAT(TIME_FLOOR(CAST(o_orderdate AS TIMESTAMP), 'P1M',
                    NULL, 'America/Los_Angeles'), 'yyyy-MM-dd HH:mm') AS la_month,
                  TIME_FORMAT(TIME_FLOOR(CAST(o_orderdate AS TIMESTAMP), 'PT1H',
                    NULL, 'Asia/Kolkata'), 'yyyy-MM-dd HH:mm') AS kolkata_hour,
                  TIME_EXTRACT(CAST(o_orderdate AS TIMESTAMP), 'DAY',
                    'America/Los_Angeles') AS la_dom,
                  COUNT(*) AS cnt
           FROM orders GROUP BY 1, 2, 3, 4""",
        frames(s, dir, "orders"))
    },
    Some("""WITH t AS (SELECT (CAST(o_orderdate AS TIMESTAMP) AT TIME ZONE 'UTC') AS i
                       FROM orders)
            SELECT strftime((date_trunc('day', i AT TIME ZONE 'America/Los_Angeles')
                     AT TIME ZONE 'America/Los_Angeles') AT TIME ZONE 'UTC',
                     '%Y-%m-%d %H:%M') AS la_day,
              strftime((date_trunc('month', i AT TIME ZONE 'America/Los_Angeles')
                     AT TIME ZONE 'America/Los_Angeles') AT TIME ZONE 'UTC',
                     '%Y-%m-%d %H:%M') AS la_month,
              strftime((date_trunc('hour', i AT TIME ZONE 'Asia/Kolkata')
                     AT TIME ZONE 'Asia/Kolkata') AT TIME ZONE 'UTC',
                     '%Y-%m-%d %H:%M') AS kolkata_hour,
              CAST(datepart('day', i AT TIME ZONE 'America/Los_Angeles') AS BIGINT)
                AS la_dom,
              count(*) AS cnt
            FROM t GROUP BY 1, 2, 3, 4""")),

    // -- SQL-based ingestion (Druid MSQ surface): INSERT INTO with an
    // hourly-rollup SELECT, DAY segments, CLUSTERED BY event_type — then
    // the store is read BACK and summarized per segment, so the oracle
    // checks the full write→layout→read round trip: rows per DAY segment =
    // distinct (hour, event_type) pairs of that day, events = raw count ---
    QueryDef("druid_sql_insert", (s, dir) => {
      val tmp = Scratch.dir("sqlingest")
      DruidSql.ingest(
        """INSERT INTO events_rollup
           SELECT TIME_FLOOR(__time, 'PT1H') AS __time, event_type,
                  COUNT(*) AS cnt
           FROM events GROUP BY 1, 2
           PARTITIONED BY DAY CLUSTERED BY event_type""",
        frames(s, dir, "events"), tmp)
      val store = s.read.parquet(s"$tmp/events_rollup")
      store.groupBy(date_format(col("segment").cast("timestamp"),
          "yyyy-MM-dd'T'HH:mm:ss").as("segment"))
        .agg(count(lit(1)).as("rows_in_segment"),
          sum(col("cnt")).as("events_in_segment"))
    },
    Some("""WITH h AS (SELECT date_trunc('hour', ts) AS hb, event_type,
                        count(*) AS cnt
                       FROM events GROUP BY 1, 2)
            SELECT strftime(date_trunc('day', hb), '%Y-%m-%dT%H:%M:%S') AS segment,
             count(*) AS rows_in_segment,
             CAST(sum(cnt) AS BIGINT) AS events_in_segment
            FROM h GROUP BY 1""")),

    // -- JSON (nested-columns) surface: JSON_VALUE scalar extraction (text
    // + numeric CAST), JSON_KEYS enumeration, STRLEN — against DuckDB's
    // independent JSON parser (json_extract_string / json_keys) ------------
    QueryDef("druid_sql_json", (s, dir) => {
      DruidSql.run(
        """SELECT event_id,
                  JSON_VALUE(props, '$.k') AS k_str,
                  CAST(JSON_VALUE(props, '$.k') AS BIGINT) AS k_num,
                  MV_TO_STRING(JSON_KEYS(props), ',') AS key_list,
                  CAST(STRLEN(props) AS BIGINT) AS plen
           FROM events WHERE event_id % 101 = 0""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
             array_to_string(json_keys(props), ',') AS key_list,
             CAST(length(props) AS BIGINT) AS plen
            FROM events WHERE event_id % 101 = 0""")),

    // -- DataSketches aggregates in the exact regime: HLL + theta both
    // equal exact COUNT(DISTINCT) at 150 uniques per group ----------------
    QueryDef("druid_sql_sketches", (s, dir) => {
      DruidSql.run(
        """SELECT event_type,
                  APPROX_COUNT_DISTINCT_DS_HLL(user_id, 14) AS uniq_hll,
                  APPROX_COUNT_DISTINCT_DS_THETA(user_id, 4096) AS uniq_theta
           FROM events
           GROUP BY event_type""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_hll,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_theta
            FROM events GROUP BY event_type""")),

    // -- DS_TUPLE_DOUBLES family (r6, datasketches-tuple): build the
    // (distinct key → summed metrics) sketch in SQL, finalize the distinct
    // estimate and the metric sums, and intersect two subquery sketches —
    // sparse-exact at k=16384 so everything hash-matches exact arithmetic.
    // TUPLE_ESTIMATE / TUPLE_METRICS_SUM are the engine finalizers the
    // dialect shares with the native postAggs -----------------------------
    QueryDef("druid_sql_tuple", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      DruidSql.run(
        """SELECT a.event_type,
                  CAST(TUPLE_ESTIMATE(a.sk) AS BIGINT) AS uniq_users,
                  ROUND(element_at(TUPLE_METRICS_SUM(a.sk), 1), 2) AS spend,
                  CAST(TUPLE_ESTIMATE(DS_TUPLE_DOUBLES_INTERSECT(a.sk, b.sk))
                    AS BIGINT) AS shared_users
           FROM (SELECT event_type,
                        DS_TUPLE_DOUBLES(user_id, value, 16384) AS sk
                 FROM events GROUP BY event_type) a
           JOIN (SELECT DS_TUPLE_DOUBLES(user_id, value, 16384) AS sk
                 FROM events WHERE event_type = 'purchase') b ON TRUE""",
        frames(s, dir, "events"))
    },
    Some("""WITH pu AS (SELECT DISTINCT user_id FROM events
                        WHERE event_type = 'purchase')
            SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users,
             round(sum(value), 2) AS spend,
             CAST(count(DISTINCT CASE WHEN user_id IN (SELECT user_id FROM pu)
               THEN user_id END) AS BIGINT) AS shared_users
            FROM events GROUP BY event_type""")),

    // -- APPROX_QUANTILE_DS in the exact regime (k ≥ group rows): the
    // sketch is the lower-rank quantile of the full multiset --------------
    QueryDef("druid_sql_quantile", (s, dir) => {
      DruidSql.run(
        """SELECT event_type,
                  ROUND(APPROX_QUANTILE_DS(value, 0.5, 16384), 4) AS p50,
                  ROUND(APPROX_QUANTILE_DS(value, 0.95, 16384), 4) AS p95
           FROM events
           GROUP BY event_type""",
        frames(s, dir, "events"))
    },
    Some("""WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events)
            SELECT event_type,
             round(max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN value END), 4) AS p50,
             round(max(CASE WHEN rk = CAST(ceil(0.95 * n) AS BIGINT) THEN value END), 4) AS p95
            FROM ranked GROUP BY 1""")),

    // -- MV_* multi-value family over STRING_TO_MV-split document text ----
    QueryDef("druid_sql_mv", (s, dir) => {
      DruidSql.run(
        """SELECT doc_id,
                  CAST(MV_LENGTH(STRING_TO_MV(text, ' ')) AS BIGINT) AS n_tok,
                  MV_OFFSET(STRING_TO_MV(text, ' '), 0) AS first_tok,
                  MV_ORDINAL(STRING_TO_MV(text, ' '), 2) AS second_tok,
                  MV_OFFSET_OF(STRING_TO_MV(text, ' '), 'the') AS the_at,
                  MV_CONTAINS(STRING_TO_MV(text, ' '), 'the') AS has_the,
                  MV_TO_STRING(STRING_TO_MV(source, 'c'), '|') AS src_mv,
                  MV_TO_STRING(MV_APPEND(STRING_TO_MV(source, 'c'), 'X'), '|') AS appended,
                  MV_TO_STRING(MV_PREPEND('Z', STRING_TO_MV(source, 'c')), '|') AS prepended,
                  MV_TO_STRING(MV_CONCAT(STRING_TO_MV(source, 'c'), STRING_TO_MV(source, 'c')), '|') AS doubled,
                  MV_TO_STRING(MV_SLICE(STRING_TO_MV(text, ' '), 1, 3), '|') AS toks_1_3,
                  MV_TO_STRING(MV_SLICE(STRING_TO_MV(source, 'c'), 0, 4), '|') AS src_sliced
           FROM documents
           WHERE doc_id % 7 = 0""",
        frames(s, dir, "documents"))
    },
    Some("""SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             string_split(text, ' ')[1] AS first_tok,
             string_split(text, ' ')[2] AS second_tok,
             CAST(nullif(list_position(string_split(text, ' '), 'the'), 0) - 1 AS BIGINT) AS the_at,
             list_contains(string_split(text, ' '), 'the') AS has_the,
             array_to_string(string_split(source, 'c'), '|') AS src_mv,
             array_to_string(list_append(string_split(source, 'c'), 'X'), '|') AS appended,
             array_to_string(list_prepend('Z', string_split(source, 'c')), '|') AS prepended,
             array_to_string(list_concat(string_split(source, 'c'), string_split(source, 'c')), '|') AS doubled,
             CASE WHEN len(string_split(text, ' ')) >= 1
                  THEN array_to_string(string_split(text, ' ')[2:3], '|') END AS toks_1_3,
             array_to_string(string_split(source, 'c')[1:4], '|') AS src_sliced
            FROM documents WHERE doc_id % 7 = 0""")),

    // -- scalar function family: DIV / BITWISE_* / TEXTCAT / STRPOS /
    // PARSE_LONG / IPV4_* — all integer/string-deterministic, so the
    // DuckDB twin is plain arithmetic ------------------------------------
    QueryDef("druid_sql_scalar_fns", (s, dir) => {
      DruidSql.run(
        """SELECT event_id,
                  DIV(user_id, 7) AS d7,
                  BITWISE_AND(user_id, 255) AS b_and,
                  BITWISE_OR(user_id, 16) AS b_or,
                  BITWISE_XOR(user_id, 99) AS b_xor,
                  BITWISE_SHIFT_LEFT(BITWISE_AND(user_id, 15), 3) AS b_shl,
                  BITWISE_SHIFT_RIGHT(user_id, 2) AS b_shr,
                  TEXTCAT(event_type, '!') AS tc,
                  CAST(STRPOS(event_type, 'c') AS BIGINT) AS sp,
                  PARSE_LONG(TEXTCAT('12', CAST(BITWISE_AND(user_id, 7) AS STRING))) AS pl,
                  PARSE_LONG('ff', 16) AS pl16,
                  IPV4_STRINGIFY(BITWISE_AND(user_id, 4294967295)) AS ip,
                  IPV4_MATCH(IPV4_STRINGIFY(BITWISE_AND(user_id, 511)), '0.0.0.0/24') AS low_ip
           FROM events
           WHERE event_id % 89 = 0""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_id,
             user_id // 7 AS d7,
             user_id & 255 AS b_and,
             user_id | 16 AS b_or,
             xor(user_id, 99) AS b_xor,
             (user_id & 15) << 3 AS b_shl,
             user_id >> 2 AS b_shr,
             event_type || '!' AS tc,
             CAST(strpos(event_type, 'c') AS BIGINT) AS sp,
             CAST('12' || CAST(user_id & 7 AS VARCHAR) AS BIGINT) AS pl,
             255 AS pl16,
             CAST((user_id >> 24) & 255 AS VARCHAR) || '.' ||
               CAST((user_id >> 16) & 255 AS VARCHAR) || '.' ||
               CAST((user_id >> 8) & 255 AS VARCHAR) || '.' ||
               CAST(user_id & 255 AS VARCHAR) AS ip,
             ((user_id & 511) & 4294967040) = 0 AS low_ip
            FROM events WHERE event_id % 89 = 0""")),

    // -- string/format family: CONTAINS_STRING / ICONTAINS_STRING /
    // DECODE_BASE64_UTF8 / HUMAN_READABLE_* / TRUNCATE. The human-readable
    // inputs are MASKED to 0..127 (unit bucket stays put at any scale
    // factor — user_id's range grows with sf) and scaled so value/divisor
    // is INTEGRAL — "%.Pf" of an exact integer can't hit a Java-HALF_UP
    // vs C-half-even midpoint, so the DuckDB printf twin is bit-identical.
    // TRUNCATE's negative-value case offsets by 1 so truncation never
    // lands on zero (DuckDB's trunc yields -0.0 there, Spark's long-cast
    // roundtrip +0.0) ----------------------------------------------------
    QueryDef("druid_sql_string_fns", (s, dir) => {
      DruidSql.run(
        """SELECT event_id,
                  CONTAINS_STRING(event_type, 'ick') AS has_ick,
                  ICONTAINS_STRING(event_type, 'SIGN') AS has_sign,
                  DECODE_BASE64_UTF8('aGVsbG8gZ3JhZnQ=') AS dec64,
                  HUMAN_READABLE_BINARY_BYTE_FORMAT(BITWISE_AND(user_id, 127) * 1048576) AS hr_bin,
                  HUMAN_READABLE_BINARY_BYTE_FORMAT(BITWISE_AND(user_id, 127) * 1048576, 0) AS hr_bin0,
                  HUMAN_READABLE_DECIMAL_BYTE_FORMAT(BITWISE_AND(user_id, 127) * 1000, 1) AS hr_dec,
                  HUMAN_READABLE_DECIMAL_FORMAT(BITWISE_AND(user_id, 127) * 1000000, 3) AS hr_plain,
                  HUMAN_READABLE_BINARY_BYTE_FORMAT(0 - BITWISE_AND(user_id, 127) * 1048576, 2) AS hr_neg,
                  REGEXP_EXTRACT(event_type, '[a-z]+') AS rex_whole,
                  REGEXP_EXTRACT(event_type, 'c(l.)ck', 1) AS rex_grp,
                  REGEXP_EXTRACT(event_type, 'zz[0-9]+') AS rex_none,
                  TRUNCATE(value, 1) AS tr1,
                  TRUNCATE(0 - value - 1, 1) AS trneg,
                  TRUNCATE(value, -1) AS trm1,
                  TRUNCATE(value) AS tr0
           FROM events
           WHERE event_id % 13 = 0""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_id,
             contains(event_type, 'ick') AS has_ick,
             contains(lower(event_type), 'sign') AS has_sign,
             'hello graft' AS dec64,
             CASE WHEN (user_id & 127) = 0 THEN '0.00 B'
                  ELSE printf('%.2f MiB', CAST(user_id & 127 AS DOUBLE)) END AS hr_bin,
             CASE WHEN (user_id & 127) = 0 THEN '0 B'
                  ELSE printf('%.0f MiB', CAST(user_id & 127 AS DOUBLE)) END AS hr_bin0,
             CASE WHEN (user_id & 127) = 0 THEN '0.0 B'
                  ELSE printf('%.1f KB', CAST(user_id & 127 AS DOUBLE)) END AS hr_dec,
             CASE WHEN (user_id & 127) = 0 THEN '0.000'
                  ELSE printf('%.3f M', CAST(user_id & 127 AS DOUBLE)) END AS hr_plain,
             CASE WHEN (user_id & 127) = 0 THEN '0.00 B'
                  ELSE printf('%.2f MiB', CAST(0 - (user_id & 127) AS DOUBLE)) END AS hr_neg,
             CASE WHEN regexp_matches(event_type, '[a-z]+')
                  THEN regexp_extract(event_type, '[a-z]+') END AS rex_whole,
             CASE WHEN regexp_matches(event_type, 'c(l.)ck')
                  THEN regexp_extract(event_type, 'c(l.)ck', 1) END AS rex_grp,
             CASE WHEN regexp_matches(event_type, 'zz[0-9]+')
                  THEN regexp_extract(event_type, 'zz[0-9]+') END AS rex_none,
             trunc(value * 10) / 10 AS tr1,
             trunc((0 - value - 1) * 10) / 10 AS trneg,
             trunc(value / 10) * 10 AS trm1,
             trunc(value) AS tr0
            FROM events WHERE event_id % 13 = 0""")),

    // -- CROSS JOIN UNNEST (r4): Druid SQL's multi-value explode idiom,
    // verbatim — the pre-parse rewrite turns the lateral UNNEST into
    // LATERAL VIEW EXPLODE (Spark's parser only takes UNCORRELATED
    // UNNEST), MV_TO_ARRAY is the identity on this engine's array MV dims
    QueryDef("druid_sql_unnest", (s, dir) => {
      DruidSql.run(
        """SELECT tag, COUNT(*) AS cnt, SUM(user_id) AS sum_uid
           FROM events CROSS JOIN UNNEST(MV_TO_ARRAY(STRING_TO_MV(
             CONCAT(event_type, ',u', MOD(user_id, 3)), ','))) AS u(tag)
           GROUP BY tag""",
        frames(s, dir, "events"))
    },
    Some("""WITH exploded AS (SELECT unnest(string_split(
              event_type || ',u' || CAST(user_id % 3 AS VARCHAR), ',')) AS tag,
              user_id
            FROM events)
            SELECT tag, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid
            FROM exploded GROUP BY 1""")),

    // -- window functions (r4): Druid SQL grew OVER clauses (Druid 28+);
    // verbatim Druid window SQL — PARTITION BY + ORDER BY with ranking,
    // lag and a running frame over TIME_FLOOR buckets — runs through the
    // dialect unchanged (Spark's window machinery underneath). Unique
    // total order inside each partition (bucket_epoch) keeps every
    // window deterministic; the ROWS frame is Druid's default
    // (unbounded preceding → current) written explicitly --------------------
    QueryDef("druid_sql_window", (s, dir) => {
      DruidSql.run(
        """SELECT event_type,
             TIME_EXTRACT(TIME_FLOOR(__time, 'P1D'), 'EPOCH') AS bucket_epoch,
             COUNT(*) AS cnt,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             LAG(COUNT(*)) OVER w AS prev_cnt,
             SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY
               TIME_FLOOR(__time, 'P1D')
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
           FROM events
           GROUP BY event_type, TIME_FLOOR(__time, 'P1D')
           WINDOW w AS (PARTITION BY event_type ORDER BY TIME_FLOOR(__time, 'P1D'))""",
        frames(s, dir, "events"))
    },
    Some("""WITH g AS (SELECT event_type, date_trunc('day', ts) AS b,
                         count(*) AS cnt
                       FROM events GROUP BY 1, 2)
            SELECT event_type,
              CAST(epoch(b) AS BIGINT) AS bucket_epoch, cnt,
              CAST(row_number() OVER w AS BIGINT) AS rn,
              lag(cnt) OVER w AS prev_cnt,
              CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS running_cnt
            FROM g
            WINDOW w AS (PARTITION BY event_type ORDER BY b)""")),

    // -- the rest of Druid's window-function surface (Druid 28+): the
    // rank family (RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST — all
    // tie-STABLE, so ordering by a tied key stays deterministic) plus the
    // value family (NTILE / FIRST_VALUE / LAST_VALUE / LEAD — tie-
    // SENSITIVE, so those order by the unique bucket epoch). LAST_VALUE
    // widens the frame explicitly: the default unbounded-preceding→current
    // frame would just echo the current row -----------------------------
    QueryDef("druid_sql_window_ranks", (s, dir) => {
      DruidSql.run(
        """WITH g AS (SELECT event_type,
                        TIME_EXTRACT(TIME_FLOOR(__time, 'P1D'), 'EPOCH') AS d,
                        COUNT(*) AS cnt
                      FROM events GROUP BY 1, 2)
           SELECT event_type, d, cnt,
             CAST(RANK() OVER (PARTITION BY event_type ORDER BY cnt) AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER (PARTITION BY event_type ORDER BY cnt) AS BIGINT) AS drnk,
             ROUND(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY cnt), 6) AS prnk,
             ROUND(CUME_DIST() OVER (PARTITION BY event_type ORDER BY cnt), 6) AS cdist,
             CAST(NTILE(4) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS quartile,
             FIRST_VALUE(cnt) OVER (PARTITION BY event_type ORDER BY d) AS first_cnt,
             LAST_VALUE(cnt) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_cnt,
             LEAD(cnt, 1) OVER (PARTITION BY event_type ORDER BY d) AS next_cnt
           FROM g""",
        frames(s, dir, "events"))
    },
    Some("""WITH g AS (SELECT event_type,
                         CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS d,
                         count(*) AS cnt
                       FROM events GROUP BY 1, 2)
            SELECT event_type, d, cnt,
              CAST(rank() OVER (PARTITION BY event_type ORDER BY cnt) AS BIGINT) AS rnk,
              CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY cnt) AS BIGINT) AS drnk,
              round(percent_rank() OVER (PARTITION BY event_type ORDER BY cnt), 6) AS prnk,
              round(cume_dist() OVER (PARTITION BY event_type ORDER BY cnt), 6) AS cdist,
              CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS quartile,
              first_value(cnt) OVER (PARTITION BY event_type ORDER BY d) AS first_cnt,
              last_value(cnt) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_cnt,
              lead(cnt, 1) OVER (PARTITION BY event_type ORDER BY d) AS next_cnt
            FROM g""")),

    // -- EARLIEST/LATEST family + bitwise + variance AGGREGATES end-to-end
    // (the builders are spec-covered; this is their oracle). Determinism:
    // `__time` is unique in events (checked: 10000/10000 distinct at
    // sf0.01), so max_by/min_by on it has no ties; the _BY forms order by
    // the unique event_id. BIT_AND/BIT_OR/BIT_XOR and VAR_POP resolve to
    // Spark's builtin aggregates — Druid's names, identical semantics ----
    QueryDef("druid_sql_agg_extras", (s, dir) => {
      DruidSql.run(
        """SELECT event_type,
             LATEST(user_id) AS last_uid,
             EARLIEST(user_id) AS first_uid,
             LATEST_BY(user_id, event_id) AS uid_at_max_eid,
             EARLIEST_BY(user_id, event_id) AS uid_at_min_eid,
             BIT_AND(user_id) AS uid_band,
             BIT_OR(user_id) AS uid_bor,
             BIT_XOR(user_id) AS uid_bxor,
             ROUND(VAR_POP(value), 4) AS value_varp,
             ROUND(STDDEV_POP(value), 4) AS value_sdp
           FROM events GROUP BY 1""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_type,
              arg_max(user_id, ts) AS last_uid,
              arg_min(user_id, ts) AS first_uid,
              arg_max(user_id, event_id) AS uid_at_max_eid,
              arg_min(user_id, event_id) AS uid_at_min_eid,
              bit_and(user_id) AS uid_band,
              bit_or(user_id) AS uid_bor,
              bit_xor(user_id) AS uid_bxor,
              round(var_pop(value), 4) AS value_varp,
              round(stddev_pop(value), 4) AS value_sdp
            FROM events GROUP BY 1""")),

    // -- GROUPING SETS + GROUPING() (Druid's groupBy subtotalsSpec surfaced
    // in SQL): the (type, bucket) / (type) / () lattice with grouping
    // flags distinguishing "grouped-out" from "naturally NULL". Spark's
    // GROUPING() returns TINYINT — cast to BIGINT on both sides ----------
    QueryDef("druid_sql_grouping_sets", (s, dir) => {
      DruidSql.run(
        """SELECT event_type, MOD(user_id, 3) AS ubucket,
             COUNT(*) AS cnt,
             CAST(SUM(user_id) AS BIGINT) AS sum_uid,
             CAST(GROUPING(event_type) AS BIGINT) AS g_et,
             CAST(GROUPING(MOD(user_id, 3)) AS BIGINT) AS g_ub
           FROM events
           GROUP BY GROUPING SETS ((event_type, MOD(user_id, 3)),
                                   (event_type), ())""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_type, user_id % 3 AS ubucket,
              count(*) AS cnt,
              CAST(sum(user_id) AS BIGINT) AS sum_uid,
              CAST(grouping(event_type) AS BIGINT) AS g_et,
              CAST(grouping(user_id % 3) AS BIGINT) AS g_ub
            FROM events
            GROUP BY GROUPING SETS ((event_type, user_id % 3),
                                    (event_type), ())""")),

    // -- top-level UNION ALL across two dataSources (Druid's table-level
    // union, the SQL twin of the native `union` dataSource): both frames
    // substitute into one statement, aligned by column position ----------
    QueryDef("druid_sql_union_all", (s, dir) => {
      DruidSql.run(
        """SELECT kind, COUNT(*) AS cnt, CAST(SUM(n) AS BIGINT) AS total
           FROM (SELECT 'event' AS kind, user_id AS n FROM events
                 UNION ALL
                 SELECT 'doc' AS kind, n_chars AS n FROM documents) u
           GROUP BY kind""",
        frames(s, dir, "events", "documents"))
    },
    Some("""SELECT kind, count(*) AS cnt, CAST(sum(n) AS BIGINT) AS total
            FROM (SELECT 'event' AS kind, user_id AS n FROM events
                  UNION ALL
                  SELECT 'doc' AS kind, n_chars AS n FROM documents) u
            GROUP BY kind""")),

    // -- PIVOT / UNPIVOT (Druid 29's Calcite surface; Spark parses the
    // same shape natively so the statements run VERBATIM through the
    // dialect). The oracle recomputes with conditional aggregation — the
    // relational definition of PIVOT — so the shape itself is gated, and
    // the round-trip (pivot → unpivot) restores the long form minus the
    // null cells, exactly SQL-standard semantics -------------------------
    // -- TABLE(APPEND(...)) (Druid 28): union-BY-NAME over dataSources,
    // missing columns null-filled — the SQL twin of the native `union`
    // dataSource. DuckDB's UNION ALL BY NAME recomputes identically ------
    QueryDef("druid_sql_append", (s, dir) => {
      DruidSql.runWithExterns(
        """SELECT COUNT(*) AS n,
                  CAST(COUNT(event_id) AS BIGINT) AS event_rows,
                  CAST(COUNT(doc_id) AS BIGINT) AS doc_rows
           FROM TABLE(APPEND('events', 'documents'))""",
        frames(s, dir, "events", "documents"), s)
    },
    Some("""WITH u AS (SELECT * FROM events
                       UNION ALL BY NAME (SELECT * FROM documents))
            SELECT count(*) AS n,
                   CAST(count(event_id) AS BIGINT) AS event_rows,
                   CAST(count(doc_id) AS BIGINT) AS doc_rows
            FROM u""")),

    // -- scalar + IN subqueries THROUGH THE DIALECT: subquery expressions
    // hold plans outside the normal transform walk, so dataSource
    // substitution/dialect rewriting must recurse into them explicitly —
    // this entry keeps that path oracled (a regression would fail loudly
    // with TABLE_OR_VIEW_NOT_FOUND, or silently skip dialect functions) --
    QueryDef("druid_sql_subquery", (s, dir) => {
      DruidSql.run(
        """SELECT event_type, COUNT(*) AS cnt
           FROM events
           WHERE user_id > (SELECT AVG(user_id) FROM events)
             AND event_type IN (SELECT event_type FROM events
                                WHERE value > 400)
           GROUP BY event_type""",
        frames(s, dir, "events"))
    },
    Some("""SELECT event_type, count(*) AS cnt FROM events
            WHERE user_id > (SELECT avg(user_id) FROM events)
              AND event_type IN (SELECT event_type FROM events
                                 WHERE value > 400)
            GROUP BY 1""")),

    QueryDef("druid_sql_pivot", (s, dir) => {
      DruidSql.run(
        """SELECT user_id,
                  CAST(COALESCE(click, 0) AS BIGINT) AS clicks,
                  CAST(COALESCE(purchase, 0) AS BIGINT) AS purchases
           FROM (SELECT user_id, event_type FROM events WHERE user_id < 50)
           PIVOT (COUNT(*) FOR event_type IN ('click', 'purchase'))""",
        frames(s, dir, "events"))
    },
    Some("""SELECT user_id,
              count(*) FILTER (event_type = 'click') AS clicks,
              count(*) FILTER (event_type = 'purchase') AS purchases
            FROM events WHERE user_id < 50 GROUP BY 1""")),

    QueryDef("druid_sql_unpivot", (s, dir) => {
      DruidSql.run(
        """SELECT user_id, metric, CAST(v AS BIGINT) AS v
           FROM (SELECT user_id,
                   COUNT(*) AS n_events,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
                 FROM events WHERE user_id < 50 GROUP BY user_id)
           UNPIVOT (v FOR metric IN (n_events, n_types))""",
        frames(s, dir, "events"))
    },
    Some("""WITH g AS (SELECT user_id, count(*) AS n_events,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
                 FROM events WHERE user_id < 50 GROUP BY 1)
            SELECT user_id, 'n_events' AS metric, n_events AS v FROM g
            UNION ALL
            SELECT user_id, 'n_types' AS metric, n_types AS v FROM g""")))
}
