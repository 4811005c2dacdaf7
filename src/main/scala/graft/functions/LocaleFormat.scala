package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-aware timestamp formatting — the seam Spark's `date_format` does
  * not have (it formats in the session locale-independent symbols). Exists
  * for the upstream `timeFormat` extractionFn's `locale` option
  * (tranquility's Druid TimeFormatExtractionFn carries format+timeZone+
  * locale): a French caller asking for 'MMMM yyyy' must get « janvier », and
  * the engine-wide ban on silent shifts means the alternative — quietly
  * formatting English — was a loud reject until r10.
  *
  * Semantics: the child timestamp (an instant) is formatted by
  * `java.time.format.DateTimeFormatter.ofPattern(fmt, locale).withZone(zone)`
  * — real zone-aware formatting, so unlike the locale-less path (a
  * `from_utc_timestamp` wall-clock rebase) zone PATTERNS (z/V/O…) render the
  * REQUESTED zone correctly here. Pattern syntax is java.time's, which
  * matches the Joda syntax upstream uses for every letter upstream documents
  * (y M d H m s E a G Q w k K h + literals); locale resolution is BCP-47 via
  * `Locale.forLanguageTag` with legacy `fr_FR` underscores accepted.
  *
  * Scale shape: deterministic per-row O(fmt) formatting, formatter built
  * ONCE per (fmt, locale, zone) per JVM (static ConcurrentHashMap — the
  * codegen call carries only the three config strings), stays inside
  * whole-stage codegen.
  */
case class LocaleDateFormat(child: Expression, fmt: String, localeTag: String,
    zoneId: String) extends UnaryExpression {

  // loud at construction: bad pattern / zone / locale should fail the QUERY
  // COMPILE, not the first executor task
  LocaleDateFormat.formatter(fmt, localeTag, zoneId)

  override def dataType: DataType = StringType
  override def prettyName: String = "locale_date_format"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"locale_date_format expects timestamp, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    LocaleDateFormat.format(input.asInstanceOf[Long], fmt, localeTag, zoneId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // config strings ride the (serializable) references array — a
    // DateTimeFormatter itself is NOT Serializable, so executors rebuild it
    // through the memoizing cache on first touch
    val f = ctx.addReferenceObj("ldfFmt", fmt, "java.lang.String")
    val l = ctx.addReferenceObj("ldfLocale", localeTag, "java.lang.String")
    val z = ctx.addReferenceObj("ldfZone", zoneId, "java.lang.String")
    nullSafeCodeGen(ctx, ev, micros =>
      s"${ev.value} = graft.functions.LocaleDateFormat.format($micros, $f, $l, $z);")
  }

  override protected def withNewChildInternal(newChild: Expression): LocaleDateFormat =
    copy(child = newChild)
}

object LocaleDateFormat {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), java.time.format.DateTimeFormatter]

  /** Resolve a locale tag loudly: BCP-47 (`fr`, `fr-CA`) plus the legacy
    * underscore form (`fr_FR`). An unknown/garbage tag resolves to the
    * undetermined locale — reject it instead of silently formatting root. */
  def locale(tag: String): java.util.Locale = {
    val loc = java.util.Locale.forLanguageTag(tag.replace('_', '-'))
    require(loc.getLanguage.nonEmpty,
      s"timeFormat locale '$tag' does not resolve to a language " +
        "(use a BCP-47 tag like 'fr' or 'fr-CA')")
    loc
  }

  def formatter(fmt: String, tag: String,
      zone: String): java.time.format.DateTimeFormatter =
    cache.computeIfAbsent((fmt, tag, zone), { _ =>
      java.time.format.DateTimeFormatter.ofPattern(fmt, locale(tag))
        .withZone(java.time.ZoneId.of(zone))
    })

  def format(micros: Long, fmt: String, tag: String, zone: String): UTF8String = {
    val instant = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    UTF8String.fromString(formatter(fmt, tag, zone).format(instant))
  }
}
