package graft

import java.sql.Timestamp

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.config._
import graft.pipeline.Pipeline
import graft.time.Granularity

/** Batch-pipeline semantics: timestamp formats, windowPeriod accept/drop with
  * observed counts (SendResult parity — SURVEY §2.2), projection modes,
  * rollup golden values (DirectDruidTest-style fixtures, FIXTURES.md §A).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val simpleSpec = IngestionSpec(
    DataSchema("simple", TimestampSpec("ts"),
      SpecificDimensions(Seq("foo")),
      Seq(AggregatorSpec("count", "cnt"),
        AggregatorSpec("longSum", "barr", Some("bar")),
        AggregatorSpec("doubleMax", "bazmax", Some("baz"))),
      GranularitySpec(Granularity.Hour, Granularity.Minute)),
    Tuning(windowPeriod = java.time.Duration.ofMinutes(10)))

  test("rollup produces golden aggregated rows") {
    val events = Seq(
      (ts("2024-01-01 10:00:10"), "x", 1L, 0.5),
      (ts("2024-01-01 10:00:50"), "x", 2L, 2.5),
      (ts("2024-01-01 10:00:55"), "y", 4L, 1.0),
      (ts("2024-01-01 10:01:10"), "x", 8L, 0.25)
    ).toDF("ts", "foo", "bar", "baz")
    val p = new Pipeline(simpleSpec)
    val out = p.rollup(p.project(p.extractTimestamp(events)))
      .orderBy("__ts", "foo")
      .select(date_format($"__ts", "HH:mm:ss").as("m"), $"foo", $"cnt", $"barr", $"bazmax")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("10:00:00", "x", 2L, 3L, 2.5),
      ("10:00:00", "y", 1L, 4L, 1.0),
      ("10:01:00", "x", 1L, 8L, 0.25)))
  }

  test("aggregators referencing the event time read raw millis (no " +
      "ambiguous projection), filtered(approxHistogram) works, negative " +
      "epochs parse by magnitude") {
    // longMax over __ts: projection must not select the time column twice
    // (review finding r7), and the value is the RAW event time in epoch
    // millis per bucket, not the bucket start
    val tsSpec = simpleSpec.copy(dataSchema = simpleSpec.dataSchema.copy(
      aggregators = Seq(AggregatorSpec("longMax", "last_ms", Some("__ts")))))
    val events = Seq(
      (ts("2024-01-01 10:00:10"), "x", 1L, 0.5),
      (ts("2024-01-01 10:00:50"), "x", 2L, 2.5)
    ).toDF("ts", "foo", "bar", "baz")
    val p = new Pipeline(tsSpec)
    val out = p.rollup(p.project(p.extractTimestamp(events)))
      .select($"last_ms").as[Long].head()
    assert(out == ts("2024-01-01 10:00:50").getTime, out)

    // filtered(approxHistogram): the wrapper supports every aggregator the
    // bare form does (review finding r7 — this case was missing)
    val fhSpec = simpleSpec.copy(dataSchema = simpleSpec.dataSchema.copy(
      aggregators = Seq(AggregatorSpec("filtered", "p50x",
        aggregator = Some(AggregatorSpec("approxHistogram", "p50x",
          Some("baz"), probabilities = Seq(0.5))),
        filterDimension = Some("foo"), filterValue = Some("x")))))
    val p2 = new Pipeline(fhSpec)
    val hist = p2.rollup(p2.project(p2.extractTimestamp(events)))
      .select($"p50x").as[Seq[Double]].head()
    assert(hist == Seq(0.5) || hist == Seq(2.5), hist) // median of {0.5, 2.5}

    // negative epoch ("auto") resolves by MAGNITUDE like positives:
    // -2e12 is 1906 in millis (|v| ≥ 1e12), not year -61386 in seconds
    // (review finding r7; values within ±1e12 stay genuinely ambiguous and
    // default to seconds, same as the positive rule)
    val negSpec = simpleSpec.copy(dataSchema = simpleSpec.dataSchema.copy(
      timestampSpec = TimestampSpec("ts", "auto"),
      granularitySpec = GranularitySpec(Granularity.Day, Granularity.Day)))
    val p3 = new Pipeline(negSpec)
    val neg = p3.extractTimestamp(
        Seq((-2000000000000L, "x", 1L, 0.5)).toDF("ts", "foo", "bar", "baz"))
      .select($"__ts".cast("string")).as[String].head()
    assert(neg.startsWith("1906-08-1"), neg)
  }

  test("ANY / mean / first-last aggregators: batch rollup semantics") {
    import graft.config._
    val events = Seq(
      (ts("2024-01-01 10:00:10"), "x", 0.5),
      (ts("2024-01-01 10:00:50"), "x", 2.5),
      (ts("2024-01-01 10:00:30"), "x", 3.0)
    ).toDF("ts", "foo", "baz")
    val spec = IngestionSpec(DataSchema("t", TimestampSpec("ts"),
      SpecificDimensions(Seq("foo")),
      Seq(AggregatorSpec("doubleAny", "any_v", Some("baz")),
        AggregatorSpec("doubleMean", "mean_v", Some("baz")),
        AggregatorSpec("doubleFirst", "first_v", Some("baz")),
        AggregatorSpec("doubleLast", "last_v", Some("baz"))),
      GranularitySpec(Granularity.Hour, Granularity.Minute)))
    val p = new Pipeline(spec)
    val row = p.rollup(p.project(p.extractTimestamp(events)))
      .select($"any_v", $"mean_v.s", $"mean_v.c", $"first_v.v", $"last_v.v")
      .as[(Double, Double, Long, Double, Double)].head()
    assert(Set(0.5, 2.5, 3.0).contains(row._1)) // ANY: some input value
    assert(row._2 == 6.0 && row._3 == 3L)       // mean partial: (sum, count)
    assert(row._4 == 0.5 && row._5 == 2.5)      // first@10:00:10, last@10:00:50
  }

  test("transformSpec bound filter: numeric vs lexicographic, strict ends") {
    import graft.config._
    val df = Seq(("a", "100.0"), ("b", "2.0"), ("c", "30.0")).toDF("k", "v")
    val base = IngestionSpec(DataSchema("t", TimestampSpec("ts"),
      SpecificDimensions(Seq("k")), Seq(AggregatorSpec("count", "cnt"))))
    def keys(f: FilterSpec): Set[String] = new Pipeline(base.copy(
      dataSchema = base.dataSchema.copy(
        transformSpec = TransformSpec(filter = Some(f)))))
      .transform(df).select($"k").collect().map(_.getString(0)).toSet

    // numeric ordering: v >= 3 keeps 100.0 and 30.0
    assert(keys(BoundFilter("v", Some("3"), scala.None,
      ordering = "numeric")) == Set("a", "c"))
    // lexicographic: "100.0" and "2.0" sort below "3" — only "30.0" passes
    assert(keys(BoundFilter("v", Some("3"), scala.None)) == Set("c"))
    // strict upper end
    assert(keys(BoundFilter("v", scala.None, Some("30.0"),
      upperStrict = true, ordering = "numeric")) == Set("b"))
    // unbounded both ends = keep all
    assert(keys(BoundFilter("v")) == Set("a", "b", "c"))
  }

  test("filter DSL null semantics: not() MATCHES null dimensions (Druid rule)") {
    import graft.config._
    // Druid: a null dimension never matches selector/in/bound, so it DOES
    // match their not() complement; Spark's raw three-valued !(NULL) would
    // silently drop these rows instead
    val df = Seq(("a", "error"), ("b", null), ("c", "click")).toDF("k", "v")
    val base = IngestionSpec(DataSchema("t", TimestampSpec("ts"),
      SpecificDimensions(Seq("k")), Seq(AggregatorSpec("count", "cnt"))))
    def keys(f: FilterSpec): Set[String] = new Pipeline(base.copy(
      dataSchema = base.dataSchema.copy(
        transformSpec = TransformSpec(filter = Some(f)))))
      .transform(df).select($"k").collect().map(_.getString(0)).toSet

    assert(keys(NotFilter(SelectorFilter("v", "error"))) == Set("b", "c"))
    assert(keys(NotFilter(InFilter("v", Seq("error", "click")))) == Set("b"))
    assert(keys(RegexFilter("v", "^c.*k$")) == Set("c"))
    assert(keys(NotFilter(RegexFilter("v", "^c.*k$"))) == Set("a", "b"))
    assert(keys(LikeFilter("v", "c%k")) == Set("c"))
    assert(keys(NotFilter(LikeFilter("v", "%r%"))) == Set("b", "c"))
    assert(keys(NotFilter(BoundFilter("v", Some("a"), scala.None))) == Set("b"))
    // a non-numeric value under numeric ordering: no match (try_cast, no
    // ANSI throw), and not() matches it
    assert(keys(BoundFilter("v", Some("0"), scala.None,
      ordering = "numeric")) == Set.empty)
    assert(keys(NotFilter(BoundFilter("v", Some("0"), scala.None,
      ordering = "numeric"))) == Set("a", "b", "c"))
  }

  test("windowPeriod drops late and future events with exact accounting") {
    // FIXTURES.md §A: events at now−20m (late), now (keep), now+20m (future)
    val now = ts("2024-01-01 12:00:00")
    val events = Seq(
      (ts("2024-01-01 11:40:00"), "late", 1L, 0.0),
      (ts("2024-01-01 12:00:00"), "ok", 1L, 0.0),
      (ts("2024-01-01 12:20:00"), "future", 1L, 0.0)
    ).toDF("ts", "foo", "bar", "baz")
    val p = new Pipeline(simpleSpec)
    val obs = Observation("win")
    val filtered = p.extractTimestamp(events)
      .observe(obs,
        count(lit(1)).as("received"),
        count(when(col("__ts").between(
          lit(now) - expr("INTERVAL 10 MINUTE"),
          lit(now) + expr("INTERVAL 10 MINUTE")), 1)).as("sent"))
    val kept = p.windowFilter(filtered, lit(now)).select($"foo").as[String].collect().toSeq
    assert(kept == Seq("ok"))
    assert(obs.get("received") == 3L && obs.get("sent") == 1L)
  }

  test("schemaless projection: all non-reserved columns become string dims") {
    val spec = IngestionSpec(DataSchema("s", TimestampSpec("ts"),
      SchemalessDimensions(dimensionExclusions = Seq("ignored")),
      Seq(AggregatorSpec("doubleSum", "v", Some("value")))))
    val df = Seq((ts("2024-01-01 00:00:00"), "a", 7, "drop-me", 1.5))
      .toDF("ts", "dim1", "dim2", "ignored", "value")
    val p = new Pipeline(spec)
    val out = p.project(p.extractTimestamp(df))
    assert(out.columns.toSeq == Seq("__ts", "dim1", "dim2", "value"))
    // dims cast to string (Druid schemaless semantics), metric input kept
    val row = out.collect().head
    assert(row.getAs[String]("dim2") == "7")
    assert(row.getAs[Double]("value") == 1.5)
  }

  test("spatial dimension synthesis joins fields with comma") {
    val spec = IngestionSpec(DataSchema("s", TimestampSpec("ts"),
      SpecificDimensions(Seq("name"), Seq(SpatialDimension("coord", Seq("lat", "lon")))),
      Nil))
    val df = Seq((ts("2024-01-01 00:00:00"), "p1", 51.5, -0.1))
      .toDF("ts", "name", "lat", "lon")
    val p = new Pipeline(spec)
    val out = p.project(p.extractTimestamp(df)).collect().head
    assert(out.getAs[String]("coord") == "51.5,-0.1")
  }

  test("timestampSpec formats: posix, millis, custom pattern, missingValue") {
    def extract(fmt: String, df: org.apache.spark.sql.DataFrame,
        missing: Option[String] = None) = {
      val spec = IngestionSpec(DataSchema("s",
        TimestampSpec("t", fmt, missing), SpecificDimensions(Nil), Nil))
      new Pipeline(spec).extractTimestamp(df)
        .select(date_format($"__ts", "yyyy-MM-dd HH:mm:ss").as("s")).as[String].collect().toSeq
    }
    assert(extract("posix", Seq(1704110400L).toDF("t")) == Seq("2024-01-01 12:00:00"))
    assert(extract("millis", Seq(1704110400123L).toDF("t")) == Seq("2024-01-01 12:00:00"))
    assert(extract("yyyy/MM/dd HH:mm", Seq("2024/01/01 12:00").toDF("t")) ==
      Seq("2024-01-01 12:00:00"))
    assert(extract("iso", Seq("2024-01-01T12:00:00").toDF("t")) == Seq("2024-01-01 12:00:00"))
    // auto: string ISO, and null → missingValue
    assert(extract("auto", Seq[Option[String]](Some("2024-01-01 12:00:00"), None)
      .toDF("t"), Some("1999-12-31 00:00:00")) ==
      Seq("2024-01-01 12:00:00", "1999-12-31 00:00:00"))
  }

  test("isRollup=false appends raw rows with segment buckets") {
    val spec = simpleSpec.copy(dataSchema = simpleSpec.dataSchema.copy(
      granularitySpec = GranularitySpec(Granularity.Hour, Granularity.None, rollup = false)))
    val events = Seq(
      (ts("2024-01-01 10:15:00"), "x", 1L, 0.5),
      (ts("2024-01-01 11:45:00"), "y", 2L, 1.5)
    ).toDF("ts", "foo", "bar", "baz")
    val p = new Pipeline(spec)
    val out = p.rollup(p.project(p.extractTimestamp(events)))
    assert(out.count() == 2) // no aggregation
    val segs = out.select(date_format(col(Pipeline.SegmentCol), "HH:mm").as("s"))
      .as[String].collect().toSet
    assert(segs == Set("10:00", "11:00"))
  }

  test("dimension that is also an aggregator input projects once (no ambiguity)") {
    // standard Druid spec shape: filtered aggregator keyed on a declared dim
    val spec = IngestionSpec(DataSchema("s", TimestampSpec("ts"),
      SpecificDimensions(Seq("foo")),
      Seq(AggregatorSpec("count", "cnt"),
        AggregatorSpec("filtered", "x_bar",
          filterDimension = Some("foo"), filterValue = Some("x"),
          aggregator = Some(AggregatorSpec("longSum", "x_bar", Some("bar")))))))
    val events = Seq(
      (ts("2024-01-01 10:00:10"), "x", 1L),
      (ts("2024-01-01 10:00:20"), "y", 2L)
    ).toDF("ts", "foo", "bar")
    val p = new Pipeline(spec)
    val out = p.rollup(p.project(p.extractTimestamp(events)))
      .select($"foo", $"cnt", $"x_bar").as[(String, Long, Option[Long])]
      .collect().toSet
    assert(out == Set(("x", 1L, Some(1L)), ("y", 1L, None)))
  }

  test("All/None granularity edges: bucketEnd total, truncate TZ-independent") {
    import graft.time.Granularity
    val i = java.time.Instant.parse("2024-06-01T12:34:56Z")
    assert(Granularity.None.bucketEnd(i) == i)
    assert(Granularity.All.bucketEnd(i) == java.time.Instant.MAX)
    assert(Granularity.All.truncateInstant(i) == java.time.Instant.EPOCH)
    val got = Seq(java.sql.Timestamp.from(i)).toDF("ts")
      .select(Granularity.All.truncate($"ts")).collect().head.getTimestamp(0)
    assert(got.toInstant == java.time.Instant.EPOCH)
  }

  test("hyperUnique (HLL) stays within 5% of exact cardinality on real data") {
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.01", "events")
    val rows = ev.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("approx"),
        count_distinct($"user_id").as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"$t: approx=$approx exact=$exact err=$err")
    }
  }

  test("full pipeline composition with decorate hook") {
    val p = new Pipeline(simpleSpec)
    val events = Seq((ts("2024-01-01 12:00:00"), "x", 1L, 0.5))
      .toDF("ts", "foo", "bar", "baz")
    val out = p(events, lit(ts("2024-01-01 12:00:00")),
      decorate = _.withColumn("decorated", lit(true)))
    assert(out.columns.contains("decorated"))
    assert(out.columns.contains(Pipeline.SegmentCol))
    assert(out.count() == 1)
  }

  test("multiValueHandling modes + typed dims; bad values loud at projection") {
    val df = Seq(("2024-01-01 00:00:00", Seq("b", "a", "b"), "7"))
      .toDF("ts", "tags", "uid")
    def proj(handling: String, tpe: String = "long") = {
      val p = new Pipeline(IngestionSpec(DataSchema("d",
        TimestampSpec("ts"),
        SpecificDimensions(Seq("tags", "uid"),
          multiValueHandling = Map("tags" -> handling),
          dimTypes = Map("uid" -> tpe)),
        Seq(AggregatorSpec("count", "cnt")))))
      p.project(p.extractTimestamp(df))
    }
    def tags(h: String): Seq[String] =
      proj(h).head().getAs[scala.collection.Seq[String]]("tags").toSeq
    assert(tags("SORTED_ARRAY") == Seq("a", "b", "b")) // Druid default: dups kept
    assert(tags("SORTED_SET") == Seq("a", "b"))
    assert(tags("ARRAY") == Seq("b", "a", "b"))
    // typed dim: the string column projects as LONG
    assert(proj("ARRAY").schema("uid").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(proj("ARRAY").head().getAs[Long]("uid") == 7L)
    assert(intercept[IllegalArgumentException](proj("SHUFFLED").collect())
      .getMessage.contains("SHUFFLED"))
    assert(intercept[IllegalArgumentException](proj("ARRAY", "decimal").collect())
      .getMessage.contains("decimal"))
  }
}
