package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 128-bit IPv6 textual parsing for `IPV6_MATCH` — a PURE parser
  * (deliberately not `InetAddress.getByName`, which falls back to DNS
  * resolution for non-literal strings: a row value must never trigger a
  * network lookup).
  *
  * Accepted forms (RFC 4291 §2.2): full eight hex groups, one `::` zero-run
  * compression, and a trailing embedded dotted-quad IPv4. Zone indices
  * (`%eth0`) and anything malformed parse to null.
  */
object Ipv6Util {

  /** `s` → [hi, lo] 64-bit halves, or null when not a valid IPv6 literal. */
  def parse(s: String): Array[Long] = {
    if (s == null || s.isEmpty || s.indexOf('%') >= 0) return null
    // split into the pre-:: and post-:: halves (at most one ::)
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null
    val (leftRaw, rightRaw) =
      if (dc < 0) (s, null)
      else (s.substring(0, dc), s.substring(dc + 2))
    def groups(part: String): Array[String] =
      if (part == null || part.isEmpty) Array.empty
      else part.split(":", -1)
    val left = groups(leftRaw)
    val right = if (dc < 0) Array.empty[String] else groups(rightRaw)
    // a part produced by split with an empty entry means a stray ':' edge
    if (left.exists(_.isEmpty) || right.exists(_.isEmpty)) return null
    // expand a trailing embedded IPv4 (only legal in the LAST group)
    def expand(gs: Array[String], isTail: Boolean): Array[Int] = {
      val out = new scala.collection.mutable.ArrayBuffer[Int](8)
      var i = 0
      while (i < gs.length) {
        val g = gs(i)
        if (g.indexOf('.') >= 0) {
          if (!(isTail && i == gs.length - 1)) return null
          val q = g.split("\\.", -1)
          if (q.length != 4) return null
          var v = 0L
          var j = 0
          while (j < 4) {
            val o = q(j)
            if (o.isEmpty || o.length > 3 || !o.forall(_.isDigit)) return null
            val ov = o.toInt
            if (ov > 255 || (o.length > 1 && o.charAt(0) == '0')) return null
            v = v * 256 + ov
            j += 1
          }
          out += (v >> 16).toInt
          out += (v & 0xffff).toInt
        } else {
          if (g.length > 4 || g.isEmpty) return null
          var v = 0
          var j = 0
          while (j < g.length) {
            val d = Character.digit(g.charAt(j), 16)
            if (d < 0) return null
            v = v * 16 + d
            j += 1
          }
          out += v
        }
        i += 1
      }
      out.toArray
    }
    // an embedded IPv4 must be the LAST 32 bits of the whole address —
    // in the left half that is only possible without a `::`
    val l = expand(left, isTail = dc < 0)
    if (l == null) return null
    val r = if (right.isEmpty) Array.empty[Int] else expand(right, isTail = true)
    if (r == null) return null
    val all: Array[Int] =
      if (dc < 0) {
        if (l.length != 8) return null
        l
      } else {
        // :: stands for at least one zero group
        if (l.length + r.length > 7) return null
        l ++ Array.fill(8 - l.length - r.length)(0) ++ r
      }
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 4) { hi = (hi << 16) | all(i); i += 1 }
    while (i < 8) { lo = (lo << 16) | all(i); i += 1 }
    Array(hi, lo)
  }

  /** Row-side kernel for [[Ipv6Match]] (called from generated code):
    * null = malformed address (never a spurious false). */
  def matchesOrNull(s: org.apache.spark.unsafe.types.UTF8String,
      hiBase: Long, loBase: Long, hiMask: Long, loMask: Long): java.lang.Boolean = {
    val p = parse(if (s == null) null else s.toString)
    if (p == null) null
    else java.lang.Boolean.valueOf(
      (p(0) & hiMask) == hiBase && (p(1) & loMask) == loBase)
  }

  /** CIDR prefix length → (hiMask, loMask). */
  def masks(bits: Int): (Long, Long) = {
    require(bits >= 0 && bits <= 128, s"IPv6 prefix bits must be 0..128, got $bits")
    val hi = if (bits == 0) 0L else if (bits >= 64) -1L else -1L << (64 - bits)
    val lo = if (bits <= 64) 0L else if (bits == 128) -1L else -1L << (128 - bits)
    (hi, lo)
  }
}

/** `IPV6_MATCH(addr, 'subnet/bits')` — Druid's IPv6 CIDR containment
  * (druid-io/tranquility pairs with Druid SQL; upstream Druid
  * `IPv6AddressMatchExprMacro`). The subnet is a plan-time literal: base
  * and masks fold at analysis into this expression's four longs, so the
  * row side is one parse + two AND-compares, inlined by whole-stage
  * codegen. Malformed/null addresses yield NULL (mirroring the engine's
  * IPV4_MATCH out-of-range rule — never a spurious match or non-match).
  */
case class Ipv6Match(child: Expression,
    hiBase: Long, loBase: Long, hiMask: Long, loMask: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ipv6_match expects a string address, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "ipv6_match"

  override def nullSafeEval(input: Any): Any =
    Ipv6Util.matchesOrNull(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      hiBase, loBase, hiMask, loMask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Boolean $r = graft.functions.Ipv6Util.matchesOrNull(
         |  $c, ${hiBase}L, ${loBase}L, ${hiMask}L, ${loMask}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.booleanValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
