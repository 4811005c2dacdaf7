package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.CustomAggregators

/** Time-windowing engine surface beyond the reference's tumbling chunks
  * (SURVEY §2.9: sliding + session windows are engine surface, not reference
  * behavior) plus the custom-Aggregator extension point (§2.11).
  */
object WindowingQueries {

  private val fmtMicro = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val all: Seq[QueryDef] = Seq(

    // -- tumbling window via window() (the native streaming form) -----------
    QueryDef("window_tumbling", (s, dir) => {
      Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("cnt"))
    },
    Some("""SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS wstart,
             event_type, count(*) AS cnt
            FROM events GROUP BY 1, 2""")),

    // -- sliding window: 2h length, 1h slide (each event in 2 buckets) ------
    QueryDef("window_sliding", (s, dir) => {
      Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("cnt"), col("sum_value"))
    },
    Some("""SELECT strftime(date_trunc('hour', ts) - o * INTERVAL 1 HOUR,
               '%Y-%m-%d %H:%M:%S') AS wstart,
             count(*) AS cnt, round(sum(value), 2) AS sum_value
            FROM events CROSS JOIN (VALUES (0), (1)) t(o)
            GROUP BY 1""")),

    // -- session window: 5-minute inactivity gap per user -------------------
    QueryDef("window_session", (s, dir) => {
      Tables.t(s, dir, "events")
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("events_in_session"))
        .select(col("user_id"),
          date_format(col("w.start"), fmtMicro).as("session_start"),
          col("events_in_session"))
    },
    // gaps-and-islands twin of session_window semantics
    Some("""WITH o AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                     THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM o)
            SELECT user_id,
              strftime(date_trunc('microsecond', min(ts)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
              count(*) AS events_in_session
            FROM s GROUP BY user_id, sid""")),

    // -- custom typed Aggregator (javascript-aggregator analog, §2.11) ------
    QueryDef("custom_udaf_sumsq", (s, dir) => {
      val sumsq = udaf(CustomAggregators.SumOfSquares)
      Tables.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(sumsq(col("value")), 2).as("sum_sq"),
          count(lit(1)).as("cnt"))
    },
    Some("""SELECT event_type, round(sum(value * value), 2) AS sum_sq,
             count(*) AS cnt
            FROM events GROUP BY 1"""))
  )
}
