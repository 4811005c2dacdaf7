package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}

import graft.queries.DruidSql

/** Druid SQL dialect surface ([[graft.functions.DruidSqlFunctions]] through
  * [[DruidSql.run]] — the `/druid/v2/sql` code path). Oracle-gated behaviors
  * live in DruidSqlQueries; these specs cover what SQL twins can't: custom
  * origins, calendar TIME_CEIL/SHIFT edges, MV array-argument forms, theta
  * set algebra, the UTC-only timezone contract, rejection messages, and the
  * no-temp-view isolation property of the substitution runner.
  */
class DruidSqlSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val events: DataFrame = Seq(
    (ts("2024-03-01 00:10:30"), "click", "alice", 1.0),
    (ts("2024-03-01 00:40:00"), "view", "bob", 2.0),
    (ts("2024-03-01 01:10:00"), "click", "alice", 4.0),
    (ts("2024-03-15 23:59:59"), "click", "bob", 8.0),
    (ts("2024-06-30 12:00:00"), "view", "carol", 16.0)
  ).toDF("__time", "event_type", "user", "value")

  private def sql1(q: String): Row =
    DruidSql.run(q, Map("events" -> events)).head()

  test("TIME_FLOOR with custom origin: buckets anchored at the origin") {
    // origin 00:05, PT30M → buckets [00:05, 00:35), [00:35, 01:05) …
    val r = sql1(
      """SELECT TIME_FORMAT(TIME_FLOOR(__time, 'PT30M', '2024-03-01T00:05:00'),
                            'HH:mm') AS b
         FROM events WHERE user = 'bob' AND event_type = 'view'""")
    assert(r.getString(0) == "00:35")
    // and an instant exactly on an origin boundary stays put
    val r2 = sql1(
      """SELECT TIME_FORMAT(TIME_FLOOR(TIME_PARSE('2024-03-01T00:35:00'),
                            'PT30M', '2024-03-01T00:05:00'), 'HH:mm') AS b
         FROM events LIMIT 1""")
    assert(r2.getString(0) == "00:35")
  }

  test("review regressions: TIMESTAMP-literal origin, case-insensitive names, ISOYEAR") {
    // TIMESTAMP '…' origin (what Druid SQL users actually write) anchors
    // buckets — previously it was silently dropped (epoch anchoring)
    val r = sql1(
      """SELECT TIME_FORMAT(TIME_FLOOR(__time, 'PT30M',
                              TIMESTAMP '2024-03-01 00:05:00'), 'HH:mm') AS b
         FROM events WHERE user = 'bob' AND event_type = 'view'""")
    assert(r.getString(0) == "00:35")
    // non-literal origin is a loud error, not a silent drop
    assert(intercept[Exception] {
      DruidSql.run("SELECT TIME_FLOOR(__time, 'PT1H', __time) FROM events",
        Map("events" -> events)).collect()
    }.getMessage.contains("origin"))

    // dataSource resolution is case-insensitive, like Spark identifiers
    val up = DruidSql.run("SELECT COUNT(*) AS n FROM EVENTS",
      Map("events" -> events)).head()
    assert(up.getLong(0) == 5L)
    // …and a CTE shadows the dataSource case-insensitively
    val sh = DruidSql.run(
      """WITH Events AS (SELECT 1 AS one) SELECT sum(one) AS s FROM events""",
      Map("events" -> events)).head()
    assert(sh.getLong(0) == 1L)

    // ISOYEAR is the ISO week-based year: 2024-12-30 is ISO week 1 of 2025
    val iso = sql1(
      """SELECT TIME_EXTRACT(TIME_PARSE('2024-12-30T12:00:00'), 'ISOYEAR') AS iy,
                TIME_EXTRACT(TIME_PARSE('2024-12-30T12:00:00'), 'YEAR') AS y,
                TIME_EXTRACT(TIME_PARSE('2027-01-01T00:00:00'), 'ISOYEAR') AS iy2
         FROM events LIMIT 1""")
    assert(iso.getLong(0) == 2025L && iso.getLong(1) == 2024L &&
      iso.getLong(2) == 2026L)
  }

  test("TIME_CEIL: fixed-width (boundary stays, interior advances) + calendar") {
    val r = sql1(
      """SELECT TIME_FORMAT(TIME_CEIL(__time, 'PT1H'), 'HH:mm') AS hc,
                TIME_FORMAT(TIME_CEIL(__time, 'P1M'), 'yyyy-MM-dd') AS mc,
                TIME_FORMAT(TIME_CEIL(TIME_FLOOR(__time, 'P1M'), 'P1M'),
                            'yyyy-MM-dd') AS mc_onb
         FROM events WHERE user = 'alice' AND value = 1.0""")
    assert(r.getString(0) == "01:00")   // 00:10:30 → next hour
    assert(r.getString(1) == "2024-04-01") // interior of March → April 1
    assert(r.getString(2) == "2024-03-01") // already on boundary → stays
  }

  test("TIME_SHIFT calendar periods preserve time-of-day; quarter = 3 months") {
    val r = sql1(
      """SELECT TIME_FORMAT(TIME_SHIFT(__time, 'P1M', 2), 'yyyy-MM-dd HH:mm:ss') AS m2,
                TIME_FORMAT(TIME_SHIFT(__time, 'P3M', 1), 'yyyy-MM-dd HH:mm:ss') AS q1,
                TIME_FORMAT(TIME_SHIFT(__time, 'P1Y', -1), 'yyyy-MM-dd HH:mm:ss') AS ym1
         FROM events WHERE user = 'carol'""")
    assert(r.getString(0) == "2024-08-30 12:00:00")
    assert(r.getString(1) == "2024-09-30 12:00:00")
    assert(r.getString(2) == "2023-06-30 12:00:00")
  }

  test("MV_CONTAINS / MV_OVERLAP with ARRAY argument = all-of / any-of") {
    val r = sql1(
      """SELECT MV_CONTAINS(STRING_TO_MV('a,b,c', ','), ARRAY('a','c')) AS all_in,
                MV_CONTAINS(STRING_TO_MV('a,b,c', ','), ARRAY('a','z')) AS not_all,
                MV_OVERLAP(STRING_TO_MV('a,b,c', ','), ARRAY('z','c')) AS any_in,
                MV_OVERLAP(STRING_TO_MV('a,b,c', ','), ARRAY('z','y')) AS none_in
         FROM events LIMIT 1""")
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
  }

  test("theta set algebra: estimate / intersect / not over DS_THETA sketches") {
    val r = sql1(
      """WITH s AS (SELECT
           DS_THETA(CASE WHEN event_type = 'click' THEN user END, 1024) AS clicks,
           DS_THETA(CASE WHEN event_type = 'view'  THEN user END, 1024) AS views
         FROM events)
         SELECT CAST(THETA_SKETCH_ESTIMATE(clicks) AS BIGINT) AS c,
                CAST(THETA_SKETCH_ESTIMATE(THETA_SKETCH_INTERSECT(clicks, views)) AS BIGINT) AS both,
                CAST(THETA_SKETCH_ESTIMATE(THETA_SKETCH_NOT(clicks, views)) AS BIGINT) AS only_c
         FROM s""")
    // clicks users {alice,bob}, views users {bob,carol} → 2 / 1 / 1
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("timezone arguments: local-calendar buckets, DST, unknown zone rejected") {
    // Tokyo (UTC+9, no DST): day-floor of 2024-06-30T12:00Z lands on Tokyo
    // midnight = 2024-06-29T15:00Z; extract/format read the local wall clock
    val r = sql1(
      """SELECT TIME_FORMAT(TIME_FLOOR(__time, 'P1D', NULL, 'Asia/Tokyo'),
                            'yyyy-MM-dd HH:mm') AS floor_utc,
                TIME_FORMAT(__time, 'yyyy-MM-dd HH:mm', 'Asia/Tokyo') AS wall,
                TIME_EXTRACT(__time, 'DAY', 'Asia/Tokyo') AS wall_day,
                TIME_EXTRACT(__time, 'EPOCH', 'Asia/Tokyo') AS epoch_s
         FROM events WHERE user = 'carol'""")
    assert(r.getString(0) == "2024-06-29 15:00")
    assert(r.getString(1) == "2024-06-30 21:00")
    assert(r.getLong(2) == 30L) // Tokyo wall day-of-month
    assert(r.getLong(3) == 1719748800L) // EPOCH is the instant: tz-independent
    // DST: LA is UTC-8 on 2024-03-01 and UTC-7 on 2024-06-30, so the same
    // day-floor query shifts by the offset change across the transition
    val dst = sql1(
      """SELECT TIME_FORMAT(TIME_FLOOR(TIME_PARSE('2024-03-01T12:00:00'),
                  'P1D', NULL, 'America/Los_Angeles'), 'HH:mm') AS winter,
                TIME_FORMAT(TIME_FLOOR(TIME_PARSE('2024-06-30T12:00:00'),
                  'P1D', NULL, 'America/Los_Angeles'), 'HH:mm') AS summer
         FROM events LIMIT 1""")
    assert(dst.getString(0) == "08:00" && dst.getString(1) == "07:00")
    // calendar TIME_SHIFT preserves the LOCAL time-of-day across a DST edge:
    // +1 month over the spring-forward in LA keeps 12:00 wall → UTC shifts
    val sh = sql1(
      """SELECT TIME_FORMAT(TIME_SHIFT(TIME_PARSE('2024-02-15T20:00:00'),
                  'P1M', 1, 'America/Los_Angeles'), 'yyyy-MM-dd HH:mm') AS s
         FROM events LIMIT 1""")
    assert(sh.getString(0) == "2024-03-15 19:00") // 12:00 LA wall both sides
    // TIME_PARSE with tz: the string is LOCAL wall time in that zone
    val p = sql1(
      """SELECT TIME_FORMAT(TIME_PARSE('2024-06-30T21:00:00', NULL, 'Asia/Tokyo'),
                            'yyyy-MM-dd HH:mm') AS utc
         FROM events LIMIT 1""")
    assert(p.getString(0) == "2024-06-30 12:00")
  }

  test("SQL ingestion: INSERT appends, REPLACE OVERWRITE ALL truncates, CLUSTERED sorts") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-spec").toString
    // INSERT: day segments from the 3 distinct event days
    val r1 = DruidSql.ingest(
      """INSERT INTO ds SELECT __time, event_type, value FROM events
         PARTITIONED BY DAY CLUSTERED BY event_type""",
      Map("events" -> events), root)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == Map(
      "2024-03-01T00:00:00" -> 3L, "2024-03-15T00:00:00" -> 1L,
      "2024-06-30T00:00:00" -> 1L))
    // second INSERT appends (Druid INSERT semantics)
    val r2 = DruidSql.ingest(
      """INSERT INTO ds SELECT __time, event_type, value FROM events
         PARTITIONED BY DAY""",
      Map("events" -> events), root)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r2 == Map(
      "2024-03-01T00:00:00" -> 6L, "2024-03-15T00:00:00" -> 2L,
      "2024-06-30T00:00:00" -> 2L))
    // REPLACE OVERWRITE ALL truncates back to one copy, monthly segments
    val r3 = DruidSql.ingest(
      """REPLACE INTO ds OVERWRITE ALL
         SELECT __time, event_type FROM events
         PARTITIONED BY P1M""",
      Map("events" -> events), root)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r3 == Map(
      "2024-03-01T00:00:00" -> 4L, "2024-06-01T00:00:00" -> 1L))
    // malformed statements are loud
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest("REPLACE INTO ds SELECT __time FROM events PARTITIONED BY DAY",
        Map("events" -> events), root)
    }.getMessage.contains("OVERWRITE ALL"))
    assert(intercept[Exception] {
      DruidSql.ingest("INSERT INTO ds SELECT event_type FROM events PARTITIONED BY DAY",
        Map("events" -> events), root)
    }.getMessage.contains("__time"))
    assert(!DruidSql.isIngest("SELECT 1 FROM events"))
    // zero-row ingestion publishes zero segments, not a throw
    val empty = DruidSql.ingest(
      """INSERT INTO empty_ds
         SELECT __time, event_type FROM events WHERE user = 'nobody'
         PARTITIONED BY ALL""",
      Map("events" -> events), root)
    assert(empty.collect().isEmpty)

    // SELF-referential REPLACE (Druid's canonical reindex): the SELECT
    // reads the very store OVERWRITE ALL replaces — the stage-then-swap
    // write must materialize the new segments BEFORE touching the old
    // store, or the scan hits a deleted path and the data is gone
    val dsFrame = spark.read.parquet(s"$root/ds")
      .withColumnRenamed("segment", "__old_segment")
    val r4 = DruidSql.ingest(
      """REPLACE INTO ds OVERWRITE ALL
         SELECT __time, event_type FROM ds
         PARTITIONED BY P1M""",
      Map("ds" -> dsFrame), root)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r4 == Map(
      "2024-03-01T00:00:00" -> 4L, "2024-06-01T00:00:00" -> 1L), r4)
  }

  test("useApproximateCountDistinct=true rewrites COUNT(DISTINCT) to " +
      "HLL++ (multi-arg approximates the tuple); default stays exact") {
    val plan = DruidSql.parse(
      """SELECT COUNT(DISTINCT user) AS u,
                COUNT(DISTINCT user, event_type) AS t
         FROM events""")
    val approx = DruidSql.runPlan(plan, Map("events" -> events),
      approxCountDistinct = true)
    val phys = approx.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(phys.contains("approx_count_distinct"), phys)
    val exact = DruidSql.runPlan(DruidSql.parse(
      """SELECT COUNT(DISTINCT user) AS u,
                COUNT(DISTINCT user, event_type) AS t
         FROM events"""), Map("events" -> events))
    val exactPhys = exact.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(!exactPhys.contains("approx_count_distinct"), exactPhys)
    // HLL++ is exact at this cardinality — same numbers either way
    assert(approx.collect().head == exact.collect().head)
    // null members exclude the TUPLE, like exact COUNT(DISTINCT a, b)
    val withNulls = Seq(("a", "x"), ("a", null), ("b", "y"))
      .toDF("u", "t")
    val n = DruidSql.runPlan(
      DruidSql.parse("SELECT COUNT(DISTINCT u, t) AS c FROM d"),
      Map("d" -> withNulls), approxCountDistinct = true)
      .collect().head.getLong(0)
    assert(n == 2L, n)
    // the rewrite reaches into subquery expressions too
    val subPhys = DruidSql.runPlan(DruidSql.parse(
      """SELECT user FROM events
         WHERE value > (SELECT COUNT(DISTINCT event_type) FROM events)"""),
      Map("events" -> events), approxCountDistinct = true)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.toString
    assert(subPhys.contains("approx_count_distinct"), subPhys)
  }

  test("REPLACE OVERWRITE WHERE reading its own dataSource (self-reindex): " +
      "staged before the doomed dirs drop, nothing lost") {
    val root = java.nio.file.Files.createTempDirectory("graft-owself").toString
    DruidSql.ingest(
      """INSERT INTO ds SELECT __time, event_type, value FROM events
         PARTITIONED BY DAY""", Map("events" -> events), root)
    // the SELECT reads ds ITSELF — the new rows must be fully staged
    // before the replaced chunk's dirs are deleted (review finding r7:
    // an un-staged delete-then-append could scan destroyed paths on a
    // cache-evicted recompute and lose the range)
    val dsFrame = spark.read.parquet(s"$root/ds")
      .select(org.apache.spark.sql.functions.col("__time").cast("timestamp").as("__time"),
        org.apache.spark.sql.functions.col("event_type"), org.apache.spark.sql.functions.col("value"))
    val r = DruidSql.ingest(
      """REPLACE INTO ds
         OVERWRITE WHERE __time >= TIMESTAMP '2024-03-01'
           AND __time < TIMESTAMP '2024-03-02'
         SELECT __time, event_type, value * 2 AS value FROM ds
         WHERE __time < TIMESTAMP '2024-03-02 00:00:00'
         PARTITIONED BY DAY""",
      Map("events" -> events, "ds" -> dsFrame), root)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("2024-03-01T00:00:00") == 3L, r)
    // doubled values landed; other chunks untouched; no staging residue
    val back = spark.read.parquet(s"$root/ds")
    assert(back.count() == 5, back.count())
    val mar1 = back.filter(org.apache.spark.sql.functions.col("__time").cast("timestamp") <
        java.sql.Timestamp.valueOf("2024-03-02 00:00:00"))
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("value"))).head().getDouble(0)
    val orig = events.filter(org.apache.spark.sql.functions.col("__time") <
        java.sql.Timestamp.valueOf("2024-03-02 00:00:00"))
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("value"))).head().getDouble(0)
    assert(math.abs(mar1 - 2 * orig) < 1e-9, s"$mar1 vs ${2 * orig}")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/.staging_where_ds")))
  }

  test("REPLACE OVERWRITE WHERE: replaces only the covered chunks; " +
      "alignment, in-range rows, and canonical predicate enforced") {
    val root = java.nio.file.Files.createTempDirectory("graft-owhere").toString
    DruidSql.ingest(
      """INSERT INTO ds SELECT __time, event_type, value FROM events
         PARTITIONED BY DAY""", Map("events" -> events), root)
    // replace ONLY the Mar-1 chunk: its 3 rows re-land (REPLACED, not
    // appended to 6); the Mar-15 and Jun-30 chunks are untouched. The
    // console's quoted "__time" + date-only literal forms parse.
    val r = DruidSql.ingest(
      """REPLACE INTO ds
         OVERWRITE WHERE "__time" >= TIMESTAMP '2024-03-01'
           AND "__time" < TIMESTAMP '2024-03-02'
         SELECT __time, event_type, value FROM events
         WHERE __time < TIMESTAMP '2024-03-02 00:00:00'
         PARTITIONED BY DAY""",
      Map("events" -> events), root)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("2024-03-01T00:00:00" -> 3L,
      "2024-03-15T00:00:00" -> 1L, "2024-06-30T00:00:00" -> 1L), r)
    // rows outside the replaced range are rejected, never leaked into
    // chunks the statement did not clear
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest(
        """REPLACE INTO ds
           OVERWRITE WHERE __time >= TIMESTAMP '2024-03-01 00:00:00'
             AND __time < TIMESTAMP '2024-03-02 00:00:00'
           SELECT __time, event_type, value FROM events PARTITIONED BY DAY""",
        Map("events" -> events), root)
    }.getMessage.contains("outside"))
    // bounds must sit on PARTITIONED BY chunk boundaries
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest(
        """REPLACE INTO ds
           OVERWRITE WHERE __time >= TIMESTAMP '2024-03-01 01:00:00'
             AND __time < TIMESTAMP '2024-03-02 00:00:00'
           SELECT __time FROM events WHERE false PARTITIONED BY DAY""",
        Map("events" -> events), root)
    }.getMessage.contains("align"))
    // only the canonical half-open __time range parses; INSERT never
    // takes OVERWRITE
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest(
        """REPLACE INTO ds OVERWRITE WHERE event_type = 'x'
           SELECT __time FROM events PARTITIONED BY DAY""",
        Map("events" -> events), root)
    }.getMessage.contains("OVERWRITE"))
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest(
        """INSERT INTO ds OVERWRITE ALL
           SELECT __time FROM events PARTITIONED BY DAY""",
        Map("events" -> events), root)
    }.getMessage.contains("REPLACE"))
    // a null __time row is OUTSIDE every range — loud, never leaked into
    // a __HIVE_DEFAULT_PARTITION__ segment the statement did not clear
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest(
        """REPLACE INTO ds
           OVERWRITE WHERE __time >= TIMESTAMP '2024-03-01'
             AND __time < TIMESTAMP '2024-03-02'
           SELECT CAST(NULL AS TIMESTAMP) AS __time, event_type FROM events
           PARTITIONED BY DAY""",
        Map("events" -> events), root)
    }.getMessage.contains("outside"))

    // straddle guards: a COARSER segment from an earlier ingest that
    // overlaps the range is loud in both directions
    val root2 = java.nio.file.Files.createTempDirectory("graft-owhere2").toString
    DruidSql.ingest(
      """INSERT INTO ds SELECT __time, event_type FROM events
         PARTITIONED BY P1M""", Map("events" -> events), root2)
    // month segment 2024-03 starts BEFORE the replaced day and holds rows
    // inside it → surviving dir would duplicate the replaced data
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest(
        """REPLACE INTO ds
           OVERWRITE WHERE __time >= TIMESTAMP '2024-03-15'
             AND __time < TIMESTAMP '2024-03-16'
           SELECT __time, event_type FROM events
           WHERE __time >= TIMESTAMP '2024-03-15'
             AND __time < TIMESTAMP '2024-03-16'
           PARTITIONED BY DAY""",
        Map("events" -> events), root2)
    }.getMessage.contains("starting before"))
    // month segment STARTS at the range but extends past its end →
    // deleting it would lose the Mar-15 rows outside the range
    assert(intercept[IllegalArgumentException] {
      DruidSql.ingest(
        """REPLACE INTO ds
           OVERWRITE WHERE __time >= TIMESTAMP '2024-03-01'
             AND __time < TIMESTAMP '2024-03-02'
           SELECT __time, event_type FROM events
           WHERE __time < TIMESTAMP '2024-03-02'
           PARTITIONED BY DAY""",
        Map("events" -> events), root2)
    }.getMessage.contains("lose data"))
  }

  test("JSON surface: nested paths, keys, TO_JSON_STRING, ARRAY_* twins") {
    val docs = Seq(
      (1L, """{"a": {"b": 7, "c": "x"}, "tags": ["t1", "t2"]}"""),
      (2L, """{"a": {"b": null}}"""),
      (3L, "not json")
    ).toDF("id", "doc")
    val r = DruidSql.run(
      """SELECT id,
                JSON_VALUE(doc, '$.a.b') AS b,
                JSON_QUERY(doc, '$.a') AS sub,
                MV_TO_STRING(JSON_KEYS(doc), '|') AS ks,
                JSON_VALUE(doc, '$.tags[0]') AS tag0,
                ARRAY_LENGTH(JSON_KEYS(doc)) AS nkeys,
                ARRAY_OFFSET(JSON_KEYS(doc), 0) AS k0,
                ARRAY_ORDINAL(JSON_KEYS(doc), 1) AS k1
         FROM d ORDER BY id""", Map("d" -> docs)).collect()
    assert(r(0).getString(1) == "7")
    assert(r(0).getString(2) == """{"b":7,"c":"x"}""")
    assert(r(0).getString(3) == "a|tags")
    assert(r(0).getString(4) == "t1")
    assert(r(0).getInt(5) == 2 && r(0).getString(6) == "a" && r(0).getString(7) == "a")
    assert(r(1).isNullAt(1)) // JSON null → SQL null, Druid's rule
    assert(r(2).isNullAt(1) && r(2).isNullAt(3)) // malformed → null, no throw
    // TO_JSON_STRING over a constructed struct (Druid's JSON_OBJECT idiom
    // arrives as a struct in this dialect) and ARRAY_TO_MV stringification
    val s2 = DruidSql.run(
      """SELECT TO_JSON_STRING(named_struct('x', 1, 'y', 'z')) AS j,
                MV_TO_STRING(ARRAY_TO_MV(ARRAY(1, 2, 3)), ',') AS mv
         FROM d LIMIT 1""", Map("d" -> docs)).head()
    assert(s2.getString(0) == """{"x":1,"y":"z"}""")
    assert(s2.getString(1) == "1,2,3")
  }

  test("rejection messages name the problem (unknown zone/unit/period)") {
    def err(q: String): String =
      intercept[Exception] { DruidSql.run(q, Map("events" -> events)).collect() }
        .getMessage
    assert(err("SELECT TIME_FLOOR(__time, 'PT1H', NULL, 'Mars/Olympus') FROM events")
      .contains("Mars/Olympus"))
    assert(err("SELECT TIME_EXTRACT(__time, 'FORTNIGHT') FROM events")
      .contains("FORTNIGHT"))
    assert(err("SELECT TIME_FLOOR(__time, 'PT90X') FROM events")
      .toLowerCase.contains("granularity"))
    assert(err("SELECT TIME_FLOOR(__time, 'P1M', '2024-01-01T00:00:00') FROM events")
      .contains("fixed-width"))
    assert(err("SELECT APPROX_QUANTILE_DS(value, 1.5) FROM events")
      .contains("[0,1]"))
  }

  test("TIME_IN_INTERVAL: [start, end) membership, malformed interval rejected") {
    val r = sql1(
      """SELECT COUNT(*) AS n,
                COUNT(CASE WHEN TIME_IN_INTERVAL(__time,
                  '2024-03-01T00:00:00/2024-03-01T01:00:00') THEN 1 END) AS h0
         FROM events""")
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L) // 00:10:30 + 00:40:00
    val e = intercept[Exception] {
      DruidSql.run("SELECT TIME_IN_INTERVAL(__time, '2024-03-01') FROM events",
        Map("events" -> events)).collect()
    }
    assert(e.getMessage.contains("start/end"))
  }

  test("TIME_PARSE returns null on unparseable input (no ANSI throw)") {
    val r = sql1(
      """SELECT TIME_PARSE('not-a-time') AS a,
                TIME_FORMAT(TIME_PARSE('2024-03-01T00:10:30'),
                            'yyyy-MM-dd HH:mm:ss') AS b,
                TIME_FORMAT(TIME_PARSE('01/Mar/2024', 'dd/MMM/yyyy'),
                            'yyyy-MM-dd') AS c
         FROM events LIMIT 1""")
    assert(r.isNullAt(0) && r.getString(1) == "2024-03-01 00:10:30" &&
      r.getString(2) == "2024-03-01")
  }

  test("LATEST/EARLIEST read __time implicitly; _BY forms explicit; STRING_AGG native") {
    // STRING_AGG is deliberately NOT registered by graft: Spark 4 ships it
    // natively (listagg alias) and Druid's 2-arg call is compatible —
    // shadowing would break 1-arg and WITHIN GROUP forms session-wide.
    // Determinism comes from WITHIN GROUP, not a forced sort.
    val r = sql1(
      """SELECT LATEST(event_type) AS last_t,
                EARLIEST(event_type) AS first_t,
                LATEST_BY(user, value) AS biggest_user,
                EARLIEST_BY(user, value) AS smallest_user,
                STRING_AGG(event_type, '|')
                  WITHIN GROUP (ORDER BY event_type) AS types
         FROM events""")
    assert(r.getString(0) == "view")   // 2024-06-30 carol view
    assert(r.getString(1) == "click")  // 2024-03-01 00:10:30 alice click
    assert(r.getString(2) == "carol")  // value 16.0 max
    assert(r.getString(3) == "alice")  // value 1.0 min
    assert(r.getString(4) == "click|click|click|view|view")
  }

  test("scalar family: THETA_SKETCH_UNION, MV_FILTER_*, IPV4 + PARSE_LONG nulls") {
    // union of per-type theta sketches = distinct users overall (sparse =
    // exact); the optional leading size literal is accepted
    val u = sql1(
      """SELECT CAST(THETA_SKETCH_ESTIMATE(
                  THETA_SKETCH_UNION(DS_THETA(CASE WHEN event_type = 'click' THEN user END),
                                     DS_THETA(CASE WHEN event_type = 'view' THEN user END))) AS BIGINT) AS u,
                CAST(THETA_SKETCH_ESTIMATE(
                  THETA_SKETCH_UNION(1024,
                                     DS_THETA(CASE WHEN event_type = 'click' THEN user END),
                                     DS_THETA(CASE WHEN event_type = 'view' THEN user END))) AS BIGINT) AS us
         FROM events""")
    assert(u.getLong(0) == 3L && u.getLong(1) == 3L) // alice, bob, carol

    // MV_FILTER_ONLY keeps listed elements (duplicates preserved),
    // MV_FILTER_NONE drops them
    val mv = sql1(
      """SELECT MV_FILTER_ONLY(STRING_TO_MV('a b a c', ' '), ARRAY('a', 'c')) AS only,
                MV_FILTER_NONE(STRING_TO_MV('a b a c', ' '), ARRAY('a')) AS none
         FROM events LIMIT 1""")
    assert(mv.getSeq[String](0) == Seq("a", "a", "c"))
    assert(mv.getSeq[String](1) == Seq("b", "c"))

    // IPv4 family: roundtrip, CIDR membership on string AND numeric
    // forms, null on invalid; PARSE_LONG null on garbage, hex forms
    val ip = sql1(
      """SELECT IPV4_STRINGIFY(IPV4_PARSE('192.168.1.5')) AS rt,
                IPV4_PARSE('192.168.1.999') AS bad,
                IPV4_MATCH('192.168.1.5', '192.168.0.0/16') AS m1,
                IPV4_MATCH('10.0.0.1', '192.168.0.0/16') AS m2,
                IPV4_MATCH(IPV4_PARSE('192.168.1.5'), '192.168.1.0/24') AS m3,
                IPV4_STRINGIFY(-1) AS neg,
                PARSE_LONG('nope') AS pbad,
                PARSE_LONG('0xFF', 16) AS phex
         FROM events LIMIT 1""")
    assert(ip.getString(0) == "192.168.1.5")
    assert(ip.isNullAt(1))
    assert(ip.getBoolean(2) && !ip.getBoolean(3) && ip.getBoolean(4))
    assert(ip.isNullAt(5) && ip.isNullAt(6))
    assert(ip.getLong(7) == 255L)

    // review regressions: numeric pass-through, out-of-range invalidity
    // (no spurious wrap-around match), 64-bit shifts on int inputs, full
    // 16-digit + negative hex, DIV resolving to Spark's own builtin
    val rr = sql1(
      """SELECT IPV4_PARSE(3232235776) AS pnum,
                IPV4_MATCH(4294967297, '0.0.0.1/32') AS wrap,
                IPV4_MATCH(-1, '255.255.255.0/24') AS negm,
                BITWISE_SHIFT_LEFT(CAST(2 AS INT), 33) AS shl64,
                PARSE_LONG('7FFFFFFFFFFFFFFF', 16) AS hexmax,
                PARSE_LONG('-ff', 16) AS hexneg,
                PARSE_LONG('FFFFFFFFFFFFFFFF', 16) AS hexover,
                DIV(-7, 2) AS dv
         FROM events LIMIT 1""")
    assert(rr.getLong(0) == 3232235776L)
    assert(rr.isNullAt(1) && rr.isNullAt(2)) // invalid addr → null, not true
    assert(rr.getLong(3) == 17179869184L)    // 2 << 33 in 64-bit
    assert(rr.getLong(4) == Long.MaxValue)
    assert(rr.getLong(5) == -255L)
    assert(rr.isNullAt(6))                   // > Long.MaxValue → null
    assert(rr.getLong(7) == -3L)             // truncation toward zero

    // rejections: bad CIDR, bad radix
    assert(intercept[Exception] { sql1(
      "SELECT IPV4_MATCH(user, '192.168.0.0/40') AS x FROM events")
    }.getMessage.contains("0..32"))
    assert(intercept[Exception] { sql1(
      "SELECT PARSE_LONG(user, 8) AS x FROM events")
    }.getMessage.contains("radix"))

    // BLOOM_FILTER / BLOOM_FILTER_TEST: members always hit (no false
    // negatives), a non-member misses at this size; ARRAY_CONCAT_AGG
    // flattens group arrays (sorted for determinism here)
    val bf = sql1(
      """WITH f AS (SELECT BLOOM_FILTER(user, 100) AS flt FROM events)
         SELECT BLOOM_FILTER_TEST('alice', (SELECT flt FROM f)) AS hit,
                BLOOM_FILTER_TEST('zz_not_a_user', (SELECT flt FROM f)) AS miss
         FROM events LIMIT 1""")
    assert(bf.getBoolean(0) && !bf.getBoolean(1))
    val ca = sql1(
      """SELECT ARRAY_SORT(ARRAY_CONCAT_AGG(STRING_TO_MV(user, '-'))) AS us
         FROM events WHERE event_type = 'view'""")
    assert(ca.getSeq[String](0) == Seq("bob", "carol"))
    // nothing aggregated → NULL (Druid's contract), not []
    val caEmpty = sql1(
      """SELECT ARRAY_CONCAT_AGG(STRING_TO_MV(user, '-')) AS us
         FROM events WHERE event_type = 'nope'""")
    assert(caEmpty.isNullAt(0))
  }

  test("substitution runner leaves no views behind and honors CTE shadowing") {
    DruidSql.run("SELECT count(*) AS c FROM events", Map("events" -> events))
      .collect()
    assert(!spark.catalog.tableExists("events"))
    // a CTE named like the dataSource shadows it (Druid's rule too)
    val r = DruidSql.run(
      """WITH events AS (SELECT 1 AS one) SELECT sum(one) AS s FROM events""",
      Map("events" -> events)).head()
    assert(r.getLong(0) == 1L)
    // …but scoping is PER SUBTREE: a CTE defined only inside a subquery
    // expression or derived table must NOT shadow the outer dataSource —
    // the outer `events` still substitutes while the inner one resolves
    // to the CTE (SQL scoping; the old collect-all-names approach failed
    // this with TABLE_OR_VIEW_NOT_FOUND)
    val sub = DruidSql.run(
      """SELECT count(*) AS c FROM events
         WHERE value IN (SELECT v FROM
           (WITH events AS (SELECT 1.0 AS v) SELECT v FROM events) t)""",
      Map("events" -> events)).head()
    assert(sub.getLong(0) == 1L, sub) // only the value=1.0 row matches
    val derived = DruidSql.run(
      """SELECT (SELECT count(*) FROM
           (WITH events AS (SELECT 1 AS one) SELECT one FROM events) i)
           + count(*) AS c
         FROM events""",
      Map("events" -> events)).head()
    assert(derived.getLong(0) == 1L + events.count(), derived.toString)
    // a CTE's OWN BODY does not see itself (non-recursive WITH): the inner
    // reference reads the DATASOURCE — Druid's `WITH x AS (… FROM x)`
    val selfRef = DruidSql.run(
      """WITH events AS (SELECT * FROM events WHERE event_type = 'click')
         SELECT count(*) AS c FROM events""",
      Map("events" -> events)).head()
    assert(selfRef.getLong(0) == 3L, selfRef)
  }

  test("bindParameters: '?' inside comments is commentary, not a placeholder") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    def p(json: String) = mapper.readTree(json)
    val bound = DruidSql.bindParameters(
      "SELECT * FROM t WHERE a = ? -- is this right?\n" +
        "/* or maybe? */ AND b = ?",
      Seq(p("""{"type":"BIGINT","value":7}"""),
        p("""{"type":"VARCHAR","value":"x"}""")))
    assert(bound.contains("a = 7") && bound.contains("b = 'x'"), bound)
    assert(bound.contains("right?") && bound.contains("maybe?"), bound)
    // an unterminated block comment swallows the rest (standard SQL) —
    // the trailing '?' binds nothing and the count check stays loud
    assert(intercept[IllegalArgumentException] {
      DruidSql.bindParameters("SELECT ? /* open ?",
        Seq(p("""{"type":"BIGINT","value":1}"""),
          p("""{"type":"BIGINT","value":2}""")))
    }.getMessage.contains("placeholders"))
  }

  test("bindParameters: a trailing backslash cannot break out of the " +
      "literal (Catalyst treats backslash-quote as an escaped quote)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    def p(json: String) = mapper.readTree(json)
    // value ends in '\': naive quote-doubling renders '...\' whose \' is an
    // ESCAPED quote to Catalyst — the next parameter would then inject into
    // the predicate (review finding r7)
    val bound = DruidSql.bindParameters(
      "SELECT * FROM t WHERE a = ? AND b = ?",
      Seq(p("""{"type":"VARCHAR","value":"x\\"}"""),
        p("""{"type":"VARCHAR","value":" OR 1=1 --"}""")))
    // the rendered statement must PARSE back to two string literals with
    // the original values — no token of the second value escapes quoting
    val plan = DruidSql.parse(bound)
    val lits = plan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType == org.apache.spark.sql.types.StringType =>
          l.value.toString
      })
    }.flatten
    assert(lits.toSet == Set("x\\", " OR 1=1 --"),
      s"literal breakout: $lits\nbound: $bound")
  }

  test("CONTAINS_STRING / ICONTAINS_STRING: literal needle, null haystack → null") {
    val r = sql1(
      """SELECT CONTAINS_STRING(event_type, 'lick') AS a,
                CONTAINS_STRING(event_type, 'LICK') AS b,
                ICONTAINS_STRING(event_type, 'LICK') AS c,
                CONTAINS_STRING(CAST(NULL AS STRING), 'x') AS d
         FROM events WHERE event_type = 'click' LIMIT 1""")
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.isNullAt(3))
    // non-literal needle is a loud error (Druid's macro contract)
    assert(intercept[Exception] {
      DruidSql.run("SELECT CONTAINS_STRING(event_type, user) FROM events",
        Map("events" -> events)).collect()
    }.getMessage.contains("needle"))
  }

  test("HUMAN_READABLE_*: unit buckets, precision, sign, zero, rejections") {
    val r = sql1(
      """SELECT HUMAN_READABLE_BINARY_BYTE_FORMAT(500) AS a,
                HUMAN_READABLE_BINARY_BYTE_FORMAT(1024) AS b,
                HUMAN_READABLE_BINARY_BYTE_FORMAT(1536, 1) AS c,
                HUMAN_READABLE_BINARY_BYTE_FORMAT(1073741824, 0) AS d,
                HUMAN_READABLE_BINARY_BYTE_FORMAT(-1536, 1) AS e,
                HUMAN_READABLE_DECIMAL_BYTE_FORMAT(1500, 1) AS f,
                HUMAN_READABLE_DECIMAL_FORMAT(1500000, 1) AS g,
                HUMAN_READABLE_DECIMAL_FORMAT(999, 0) AS h,
                HUMAN_READABLE_BINARY_BYTE_FORMAT(0) AS z
         FROM events LIMIT 1""")
    assert(r.getString(0) == "500.00 B")
    assert(r.getString(1) == "1.00 KiB")
    assert(r.getString(2) == "1.5 KiB")
    assert(r.getString(3) == "1 GiB")
    assert(r.getString(4) == "-1.5 KiB")
    assert(r.getString(5) == "1.5 KB")
    assert(r.getString(6) == "1.5 M")
    assert(r.getString(7) == "999")
    assert(r.getString(8) == "0.00 B")
    // precision outside [0, 3] rejects loudly
    assert(intercept[Exception] {
      DruidSql.run("SELECT HUMAN_READABLE_BINARY_BYTE_FORMAT(10, 4) FROM events",
        Map("events" -> events)).collect()
    }.getMessage.contains("precision"))
  }

  test("TRUNCATE: toward zero, negative digits, null; MV_SLICE bounds; DECODE_BASE64") {
    val r = sql1(
      """SELECT TRUNCATE(3.79, 1) AS a, TRUNCATE(-3.79, 1) AS b,
                TRUNCATE(1234.5, -2) AS c, TRUNCATE(9.99) AS d,
                TRUNCATE(CAST(NULL AS DOUBLE), 1) AS e,
                MV_TO_STRING(MV_SLICE(STRING_TO_MV('a,b,c,d', ','), 1, 3), '|') AS s1,
                MV_SLICE(STRING_TO_MV('a,b', ','), 1, 5) AS s2,
                MV_SLICE(STRING_TO_MV('a,b', ','), -1, 1) AS s3,
                MV_SLICE(STRING_TO_MV('a,b', ','), 3, 4) AS s3b,
                MV_TO_STRING(MV_SLICE(STRING_TO_MV('a,b', ','), 1), '|') AS s4,
                DECODE_BASE64_UTF8('Z3JhZnQ=') AS dec,
                TRUNCATE(CAST('NaN' AS DOUBLE), 1) AS tnan,
                TRUNCATE(1e30, 2) AS tbig
         FROM events LIMIT 1""")
    assert(r.getDouble(0) == 3.7 && r.getDouble(1) == -3.7)
    assert(r.getDouble(2) == 1200.0 && r.getDouble(3) == 9.0)
    assert(r.isNullAt(4))
    assert(r.getString(5) == "b|c")
    // end past length PADS with nulls (Druid's Arrays.copyOfRange shape)
    assert(r.getSeq[String](6) == Seq("b", null, null, null))
    // start < 0 / start > length → null
    assert(r.isNullAt(7) && r.isNullAt(8))
    assert(r.getString(9) == "b")          // end defaults to length
    assert(r.getString(10) == "graft")
    // NaN / out-of-long-range magnitudes → null, not an ANSI throw
    assert(r.isNullAt(11) && r.isNullAt(12))
  }

  test("REGEXP_EXTRACT: Druid semantics on the dialect, builtin untouched") {
    // Druid: 2-arg returns the WHOLE match (index 0); no match → NULL
    val r = sql1(
      """SELECT REGEXP_EXTRACT(event_type, 'l(i.)k') AS whole,
                REGEXP_EXTRACT(event_type, 'l(i.)k', 1) AS grp,
                REGEXP_EXTRACT(event_type, 'zz[0-9]+') AS miss,
                REGEXP_EXTRACT(user, '(a)(l)(i)', 3) AS g3
         FROM events WHERE event_type = 'click' LIMIT 1""")
    assert(r.getString(0) == "lick")
    assert(r.getString(1) == "ic")
    assert(r.isNullAt(2))
    assert(r.getString(3) == "i")
    // the rewrite is scoped to the dialect runner: plain Spark SQL on the
    // SAME session keeps the builtin (2-arg = group 1, no-match = '')
    val b = spark.sql(
      """SELECT regexp_extract('click', 'l(i.)k') AS grp1,
                regexp_extract('click', 'zz[0-9]+') AS empty""").head()
    assert(b.getString(0) == "ic")
    assert(b.getString(1) == "")
    // works inside CTE bodies too (not plan children — explicit recursion)
    val c = sql1(
      """WITH x AS (SELECT REGEXP_EXTRACT(event_type, 'zz') AS m FROM events)
         SELECT m FROM x LIMIT 1""")
    assert(c.isNullAt(0))
    // non-literal pattern is a loud error (Druid requires literal patterns)
    assert(intercept[Exception] {
      sql1("SELECT REGEXP_EXTRACT(event_type, user) FROM events")
    }.getMessage.toLowerCase.contains("pattern"))
  }

  test("CROSS JOIN UNNEST: lateral explode over a correlated array, " +
      "MV_TO_ARRAY identity, comma form") {
    val r = DruidSql.run(
      """SELECT tag, COUNT(*) AS cnt
         FROM events CROSS JOIN UNNEST(MV_TO_ARRAY(
           STRING_TO_MV(CONCAT(event_type, ',', user), ','))) AS u(tag)
         WHERE __time < TIMESTAMP '2024-03-02'
         GROUP BY tag""",
      Map("events" -> events))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // 3 rows before 03-02: click/alice ×2, view/bob
    assert(r == Map("click" -> 2L, "view" -> 1L, "alice" -> 2L, "bob" -> 1L))
    // comma form (`FROM t, UNNEST(…) AS u(c)`) rewrites too
    val c = DruidSql.run(
      """SELECT tag, COUNT(*) AS cnt
         FROM events, UNNEST(STRING_TO_MV(user, 'x')) AS u(tag)
         WHERE event_type = 'view' GROUP BY tag""",
      Map("events" -> events))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(c == Map("bob" -> 1L, "carol" -> 1L))
  }

  test("UNNEST rewrite is quote-aware and fails loudly without AS alias(col)") {
    // the idiom INSIDE a string literal is data, not syntax
    val lit = sql1(
      """SELECT 'a CROSS JOIN UNNEST(x) AS u(c) b' AS s FROM events LIMIT 1""")
    assert(lit.getString(0) == "a CROSS JOIN UNNEST(x) AS u(c) b")
    // missing alias(col): the rewrite cannot name the emitted column
    assert(intercept[Exception] {
      DruidSql.run(
        "SELECT 1 FROM events CROSS JOIN UNNEST(STRING_TO_MV(user, ','))",
        Map("events" -> events)).collect()
    }.getMessage.contains("alias"))
  }

  test("IPV6_MATCH: full/compressed/embedded-IPv4 forms, prefix edges 0/64/" +
      "65/128, malformed → null, bad subnets rejected") {
    val r = sql1(
      """SELECT IPV6_MATCH('2001:db8:0:0:0:0:0:1', '2001:db8::/32') AS full_form,
                IPV6_MATCH('2001:db8::1', '2001:db8::/32') AS compressed,
                IPV6_MATCH('2001:db9::1', '2001:db8::/32') AS other_net,
                IPV6_MATCH('::ffff:192.168.1.5', '::ffff:192.168.0.0/112') AS v4_embedded,
                IPV6_MATCH('::ffff:10.0.0.1', '::ffff:192.168.0.0/112') AS v4_out,
                IPV6_MATCH('fe80::1', '::/0') AS all_match,
                IPV6_MATCH('2001:db8:0:1::', '2001:db8::/64') AS beyond_64,
                IPV6_MATCH('2001:db8::8000:0:0:0', '2001:db8::8000:0:0:0/65') AS bit_65,
                IPV6_MATCH('2001:db8::1', '2001:db8::1/128') AS exact_128,
                IPV6_MATCH('2001:db8::2', '2001:db8::1/128') AS exact_miss,
                IPV6_MATCH('not-an-ip', '2001:db8::/32') AS malformed,
                IPV6_MATCH('1:2:3:4:5:6:7::8', '::/0') AS bad_dc,
                IPV6_MATCH('fe80::1%eth0', '::/0') AS zone_id
         FROM events LIMIT 1""")
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4) && r.getBoolean(5))
    assert(!r.getBoolean(6)) // fourth group 1 ≠ 0 inside /64
    assert(r.getBoolean(7))
    assert(r.getBoolean(8) && !r.getBoolean(9))
    assert(r.isNullAt(10) && r.isNullAt(11) && r.isNullAt(12))
    // subnet must be a literal with sane bits; base must parse
    for (bad <- Seq(
        "SELECT IPV6_MATCH('::1', '2001:db8::/129') FROM events",
        "SELECT IPV6_MATCH('::1', 'nope/64') FROM events",
        "SELECT IPV6_MATCH('::1', '2001:db8::1') FROM events"))
      assert(intercept[Exception] {
        DruidSql.run(bad, Map("events" -> events)).collect()
      }.getMessage.toLowerCase.contains("ipv6_match"))
  }

  test("TIMESTAMPADD / TIMESTAMPDIFF / EXTRACT run verbatim through the " +
      "dialect (Spark builtins carry Druid's semantics)") {
    val r = sql1(
      """SELECT TIME_FORMAT(TIMESTAMPADD(HOUR, 3, __time),
                  'yyyy-MM-dd HH:mm:ss') AS plus3h,
                TIMESTAMPDIFF(DAY, TIME_PARSE('2024-03-01T00:00:00'),
                  TIME_PARSE('2024-03-15T23:59:59')) AS days,
                CAST(EXTRACT(HOUR FROM __time) AS BIGINT) AS hr
         FROM events WHERE user = 'carol'""")
    assert(r.getString(0) == "2024-06-30 15:00:00")
    assert(r.getLong(1) == 14L)
    assert(r.getLong(2) == 12L)
  }

  test("DS_RANK / DS_CDF / DS_HISTOGRAM exact regime; STRING_FORMAT is " +
      "java.util.Formatter semantics") {
    // values 1,2,4,8,16 (5 distinct ≪ k=128 → the sketch is exact):
    // rank(4) = 3/5; cdf(2,8) = [2/5, 4/5, 1]; inclusive (prev, split]
    // bins: hist(2,8) = [2 (1,2), 2 (4,8), 1 (16)] — partial sums 2,4,5
    // equal cdf·N at each split (the getPMF INCLUSIVE criterion)
    val r = sql1(
      """SELECT DS_RANK(value, 4.0) AS rk,
                DS_CDF(value, 2.0, 8.0) AS cdf,
                DS_HISTOGRAM(value, 2.0, 8.0) AS hist
         FROM events""")
    assert(r.getDouble(0) == 0.6)
    assert(r.getSeq[Double](1) == Seq(0.4, 0.8, 1.0))
    assert(r.getSeq[Double](2) == Seq(2.0, 2.0, 1.0))
    val f = sql1(
      """SELECT STRING_FORMAT('%s:%.1f #%03d', user, value, 7) AS s
         FROM events WHERE user = 'carol'""")
    assert(f.getString(0) == "carol:16.0 #007")
    // non-literal pattern is a loud error; ds functions need ≥1 split
    assert(intercept[Exception] {
      sql1("SELECT STRING_FORMAT(user, value) FROM events")
    }.getMessage.contains("pattern"))
    assert(intercept[Exception] {
      sql1("SELECT DS_CDF(value) FROM events")
    }.getMessage.contains("split"))
  }

  test("APPROX_QUANTILE: builtin-histogram form, exact in the high-accuracy " +
      "regime; bad prob rejected") {
    // 5 values 1,2,4,8,16 — accuracy ≫ n makes the GK sketch exact:
    // percentile_approx picks the smallest value at rank ≥ ceil(p·n)
    val r = sql1(
      """SELECT APPROX_QUANTILE(value, 0.5) AS p50,
                APPROX_QUANTILE(value, 1.0, 1000) AS p100
         FROM events""")
    assert(r.getDouble(0) == 4.0 && r.getDouble(1) == 16.0)
    assert(intercept[Exception] {
      sql1("SELECT APPROX_QUANTILE(value, 1.5) FROM events")
    }.getMessage.contains("[0,1]"))
  }

  // ------------------------------------------------------- TABLE(EXTERN)

  test("extractExterns: rewrite, '' escapes, quote-awareness, arg count") {
    val (rew, ex) = DruidSql.extractExterns(
      """SELECT a FROM TABLE(EXTERN('{"type":"local","files":["/x''s.json"]}',
        '{"type":"json"}', '[{"name":"a","type":"string"}]')) WHERE a = 'x'""")
    assert(rew.contains("FROM __extern_0 WHERE"), rew)
    assert(ex.size == 1)
    val (name, (src, fmt, sig)) = ex.head
    assert(name == "__extern_0")
    assert(src == """{"type":"local","files":["/x's.json"]}""") // '' unescaped
    assert(fmt == """{"type":"json"}""")
    assert(sig == """[{"name":"a","type":"string"}]""")
    // EXTERN inside a string literal is data, not syntax
    val (same, none) = DruidSql.extractExterns(
      "SELECT 'TABLE(EXTERN(x))' AS s FROM t")
    assert(none.isEmpty && same == "SELECT 'TABLE(EXTERN(x))' AS s FROM t")
    // wrong arg count is loud
    assert(intercept[Exception] {
      DruidSql.extractExterns("SELECT 1 FROM TABLE(EXTERN('a', 'b'))")
    }.getMessage.contains("inputSource"))
  }

  test("EXTERN end-to-end: json + csv files through the parseSpec formats, " +
      "malformed record → all-null row, non-local source rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-extern")
    val json = dir.resolve("d.json")
    java.nio.file.Files.writeString(json,
      """{"w": "alpha", "n": 1}
        |{"w": "beta", "n": 2}
        |not json at all
        |""".stripMargin)
    val csv = dir.resolve("d.csv")
    java.nio.file.Files.writeString(csv, "gamma,3\ndelta,4\n")
    def q(file: String, fmt: String) =
      s"""SELECT w, n FROM TABLE(EXTERN(
           '{"type":"local","files":["$file"]}', '$fmt',
           '[{"name":"w","type":"string"},{"name":"n","type":"long"}]'))"""
    val j = DruidSql.runWithExterns(q(json.toString, """{"type":"json"}"""),
      Map.empty, spark).collect()
    assert(j.map(r => (r.getAs[String]("w"), r.get(1))).toSet ==
      Set(("alpha", 1L), ("beta", 2L), (null, null))) // malformed → all-null
    val c = DruidSql.runWithExterns(q(csv.toString, """{"type":"csv"}"""),
      Map.empty, spark).collect()
    assert(c.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("gamma", 3L), ("delta", 4L)))
    // EXTERN composes with dataSources in one statement
    val mixed = DruidSql.runWithExterns(
      s"""SELECT e.user, x.n FROM events e
          JOIN (SELECT w, n FROM TABLE(EXTERN(
            '{"type":"local","files":["${csv.toString}"]}', '{"type":"csv"}',
            '[{"name":"w","type":"string"},{"name":"n","type":"long"}]'))) x
          ON e.value = CAST(x.n AS DOUBLE)""",
      Map("events" -> events), spark).collect()
    assert(mixed.length == 1 && mixed.head.getString(0) == "alice") // value=4.0
    // zero-egress contract: remote inputSources are a loud error
    assert(intercept[Exception] {
      DruidSql.runWithExterns(
        q("http://example.com/x.json", """{"type":"json"}""")
          .replace(""""type":"local"""", """"type":"http""""),
        Map.empty, spark).collect()
    }.getMessage.contains("local"))

    // columnar EXTERN (parquet/orc, the MSQ batch-input formats): native
    // reader, signature projects+casts; a column the signature names but
    // the file lacks is an analysis error, not an all-null row
    val pq = dir.resolve("d.parquet").toString
    Seq(("epsilon", 5L, 1.5), ("zeta", 6L, 2.5)).toDF("w", "n", "x")
      .write.mode("overwrite").parquet(pq)
    val pr = DruidSql.runWithExterns(
      s"""SELECT w, n FROM TABLE(EXTERN(
           '{"type":"local","files":["$pq"]}', '{"type":"parquet"}',
           '[{"name":"w","type":"string"},{"name":"n","type":"long"}]'))""",
      Map.empty, spark).collect()
    assert(pr.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("epsilon", 5L), ("zeta", 6L)))
    val orc = dir.resolve("d.orc").toString
    Seq(("eta", 7L)).toDF("w", "n").write.mode("overwrite").orc(orc)
    val or = DruidSql.runWithExterns(
      s"""SELECT w, n FROM TABLE(EXTERN(
           '{"type":"local","files":["$orc"]}', '{"type":"orc"}',
           '[{"name":"w","type":"string"},{"name":"n","type":"long"}]'))""",
      Map.empty, spark).collect()
    assert(or.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("eta", 7L)))
    assert(intercept[Exception] {
      DruidSql.runWithExterns(
        s"""SELECT missing FROM TABLE(EXTERN(
             '{"type":"local","files":["$pq"]}', '{"type":"parquet"}',
             '[{"name":"missing","type":"string"}]'))""",
        Map.empty, spark).collect()
    }.getMessage.toLowerCase.contains("missing"))
  }

  test("OVERWRITE WHERE crash recovery: a published journal rolls forward " +
      "at the next ingest; unjournaled staging is discarded") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val root = java.nio.file.Files.createTempDirectory("graft-owcrash").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    DruidSql.ingest(
      """INSERT INTO ds SELECT __time, event_type, value FROM events
         PARTITIONED BY DAY""", Map("events" -> events), root)

    // ---- manufacture the crash state of
    //   REPLACE INTO ds OVERWRITE WHERE [Mar-01, Mar-02)
    //     SELECT …, value * 2 … PARTITIONED BY DAY
    // interrupted AFTER the journal published but BEFORE any rename:
    // staging holds the doubled Mar-01 chunk, target is still intact.
    DruidSql.ingest(
      """INSERT INTO scratch_src
         SELECT __time, event_type, value * 2 AS value FROM events
         WHERE __time < TIMESTAMP '2024-03-02 00:00:00'
         PARTITIONED BY DAY""", Map("events" -> events), root)
    val segName = fs.listStatus(p(s"$root/scratch_src"))
      .map(_.getPath.getName).find(_.startsWith("segment=")).get
    fs.mkdirs(p(s"$root/.staging_where_ds"))
    assert(fs.rename(p(s"$root/scratch_src/$segName"),
      p(s"$root/.staging_where_ds/$segName")))
    fs.delete(p(s"$root/scratch_src"), true)
    val journal = s"staged $segName\ndoomed $segName"
    val os = fs.create(p(s"$root/.journal_where_ds"), true)
    os.write(journal.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    os.close()

    // next ingest of ds (any statement) rolls the commit FORWARD first
    DruidSql.ingest(
      """INSERT INTO ds
         SELECT __time, event_type, value FROM events
         WHERE __time >= TIMESTAMP '2024-06-01 00:00:00'
         PARTITIONED BY DAY""", Map("events" -> events), root)
    val back = spark.read.parquet(s"$root/ds")
    // Mar-01 rows are the DOUBLED staged set (1+2+4 → 14.0), not lost,
    // not duplicated alongside the doomed originals
    val mar1 = back.filter(col("__time").cast("timestamp") <
        java.sql.Timestamp.valueOf("2024-03-02 00:00:00"))
    assert(mar1.count() == 3, mar1.count())
    assert(math.abs(mar1.agg(fsum(col("value"))).head.getDouble(0) - 14.0) < 1e-9)
    // the other chunks are intact and the append landed (Jun-30 ×2 rows)
    assert(back.count() == 6, back.count())
    // commit artifacts fully cleaned
    assert(!fs.exists(p(s"$root/.staging_where_ds")))
    assert(!fs.exists(p(s"$root/.retired_where_ds")))
    assert(!fs.exists(p(s"$root/.journal_where_ds")))

    // ---- unjournaled staging (crash BEFORE the journal published) is
    // discarded: the statement never started committing
    fs.mkdirs(p(s"$root/.staging_where_ds/segment=junk"))
    val before = back.count()
    DruidSql.ingest(
      """INSERT INTO ds
         SELECT __time, event_type, value FROM events
         WHERE __time >= TIMESTAMP '2024-06-01 00:00:00'
         PARTITIONED BY DAY""", Map("events" -> events), root)
    assert(!fs.exists(p(s"$root/.staging_where_ds")))
    assert(spark.read.parquet(s"$root/ds").count() == before + 1)

    // ---- LATE crash (review finding r8): journal still present, staged
    // dir ALREADY renamed into the target (staging twin gone, only
    // cleanup remained). Recovery must recognize the target dir as the
    // NEW data — re-retiring it would silently destroy the freshly
    // committed segment.
    val segNames = fs.listStatus(p(s"$root/ds")).map(_.getPath.getName)
      .filter(_.startsWith("segment=")).sorted
    val victim = segNames.head
    val rowsBefore = spark.read.parquet(s"$root/ds").count()
    val sumBefore = spark.read.parquet(s"$root/ds")
      .agg(fsum(col("value"))).head.getDouble(0)
    fs.mkdirs(p(s"$root/.staging_where_ds")) // empty: staged twin consumed
    val os2 = fs.create(p(s"$root/.journal_where_ds"), true)
    os2.write(s"staged $victim\ndoomed $victim"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    os2.close()
    DruidSql.ingest(
      """INSERT INTO ds
         SELECT __time, event_type, value FROM events
         WHERE __time >= TIMESTAMP '2024-06-01 00:00:00'
         PARTITIONED BY DAY""", Map("events" -> events), root)
    val after = spark.read.parquet(s"$root/ds")
    // the victim chunk survived recovery; only the new append was added
    assert(fs.exists(p(s"$root/ds/$victim")), s"recovery destroyed $victim")
    assert(after.count() == rowsBefore + 1, after.count())
    val sumAfter = after.agg(fsum(col("value"))).head.getDouble(0)
    assert(sumAfter > sumBefore) // nothing lost, one row gained
    assert(!fs.exists(p(s"$root/.journal_where_ds")))
    assert(!fs.exists(p(s"$root/.retired_where_ds")))
  }
}
