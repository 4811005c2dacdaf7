package graft.time

/** Druid ISO-8601 interval strings ("start/end"). Endpoints parse JVM-side
  * to epoch millis so session-timezone settings can't shift zoned inputs;
  * zone-less endpoints are UTC (Druid's default).
  */
object Intervals {

  def parseInstantMillis(s: String): Long =
    scala.util.Try(java.time.Instant.parse(s).toEpochMilli)
      .orElse(scala.util.Try(
        java.time.OffsetDateTime.parse(s).toInstant.toEpochMilli))
      .orElse(scala.util.Try(java.time.LocalDateTime.parse(s)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      // date-only endpoints ("2020-01-01/2020-01-02") are Druid's most
      // common interval spelling — midnight UTC (review finding r7)
      .orElse(scala.util.Try(java.time.LocalDate.parse(s).atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse interval endpoint '$s' as an ISO-8601 instant"))

  /** "start/end" → [startMillis, endMillis) — end exclusive, Druid's rule. */
  def parse(s: String): (Long, Long) = {
    val parts = s.split("/", 2)
    require(parts.length == 2, s"interval '$s' is not start/end")
    val (lo, hi) = (parseInstantMillis(parts(0)), parseInstantMillis(parts(1)))
    require(lo <= hi, s"interval '$s' has start after end")
    (lo, hi)
  }
}
