package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.time.Granularity

/** Property-style tests (seeded sampling) for the truncation primitives
  * everything else depends on (SURVEY §7 step 2): idempotence, bucket
  * containment, and agreement between the pure-Scala and Column
  * implementations.
  */
class GranularitySpec extends SparkSpec {

  // deterministic sample: 2000-01-01 .. 2030-01-01
  private val rnd = new scala.util.Random(42)
  private val samples: Seq[Instant] = (0 until 500).map { _ =>
    Instant.ofEpochSecond(946684800L + rnd.nextLong(946771200L),
      rnd.nextInt(1000000000))
  }

  private val grans = Granularity.values.filterNot(_ == Granularity.None)

  test("truncation is idempotent") {
    for (i <- samples; g <- grans) {
      val t = g.truncateInstant(i)
      assert(g.truncateInstant(t) == t, s"$g not idempotent at $i")
    }
  }

  test("truncation floors into the containing bucket") {
    for (i <- samples; g <- grans if g != Granularity.All) {
      val t = g.truncateInstant(i)
      assert(!t.isAfter(i), s"$g truncate went forward at $i")
      assert(g.bucketEnd(i).isAfter(i), s"$g bucketEnd not after $i")
      assert(!g.truncateInstant(g.bucketEnd(i).minusNanos(1)).isBefore(t),
        s"$g bucket not contiguous at $i")
    }
  }

  test("Column truncate agrees with pure-Scala truncate") {
    import spark.implicits._
    // micro resolution: Spark TimestampType is µs
    val micro = samples.take(200).map(i =>
      i.minusNanos(i.getNano % 1000))
    val df = micro.map(java.sql.Timestamp.from).toDF("ts")
    grans.foreach { g =>
      val got = df.select(g.truncate(col("ts")).as("t")).collect()
        .map(_.getTimestamp(0).toInstant).toSeq
      val want = micro.map(i => g.truncateInstant(i))
      assert(got == want, s"column/scala disagree for $g")
    }
  }

  test("calendar truncation honours the zone argument (session-tz boundaries)") {
    import java.time.{Instant, ZoneId}
    val ny = ZoneId.of("America/New_York")
    // Mar 1 01:00 UTC = Feb 28 20:00 in New York: the NY month bucket is
    // Feb 1 00:00 NY (= Feb 1 05:00 UTC), NOT the UTC month boundary —
    // getting this wrong made retention drop the live month chunk
    val i = Instant.parse("2024-03-01T01:00:00Z")
    assert(Granularity.Month.truncateInstant(i) == Instant.parse("2024-03-01T00:00:00Z"))
    assert(Granularity.Month.truncateInstant(i, ny) == Instant.parse("2024-02-01T05:00:00Z"))
    // fixed widths are zone-independent epoch arithmetic
    assert(Granularity.Hour.truncateInstant(i, ny) == Granularity.Hour.truncateInstant(i))
  }

  test("fromString round-trips and rejects junk") {
    Granularity.values.foreach { g =>
      assert(Granularity.fromString(g.name) == g)
      assert(Granularity.fromString(g.name.toLowerCase) == g)
    }
    intercept[IllegalArgumentException](Granularity.fromString("fortnight"))
  }

  test("duration granularity: arbitrary fixed widths behave like the named set") {
    val g = Granularity.fromString("PT90S")
    assert(g == Granularity.Duration(90))
    assert(g.widthSeconds == 90)
    assert(Granularity.fromString(g.name) == g) // round-trips via its name
    // same properties the named fixed widths carry
    for (i <- samples.take(100)) {
      val t = g.truncateInstant(i)
      assert(g.truncateInstant(t) == t)
      assert(!t.isAfter(i) && i.isBefore(g.bucketEnd(t)))
      assert(t.getEpochSecond % 90 == 0)
    }
    // sub-second and junk durations rejected
    intercept[IllegalArgumentException](Granularity.fromString("PT0.5S"))
    intercept[IllegalArgumentException](Granularity.fromString("PT-30S"))
  }
}
