package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `alphanumeric_key(s)` — an ORDER-PRESERVING sort key for Druid's
  * `alphanumeric` string comparator (upstream StringComparators
  * ALPHANUMERIC, the Alphanum algorithm): digit runs compare numerically
  * (by run length including leading zeros, then digit-wise — so
  * "a2" < "a10" and "07" < "007"), everything else character-wise.
  *
  * The key rewrites each digit run as a fixed-width 3-digit length prefix
  * followed by the run itself; plain string ordering of keys then equals
  * the alphanumeric ordering of the originals, so the collation rides
  * Spark's native sort (range partitioning, TakeOrderedAndProject) instead
  * of a comparator. Two documented bounds: digit runs longer than 999
  * compare by their first 999 digits, and non-digit characters BELOW '0'
  * in code-point order (space and ASCII punctuation) adjacent to digits
  * keep raw order rather than the chunk-boundary order — both unreachable
  * for the dimension values this ordering is used on (identifier-shaped
  * strings).
  */
case class AlphanumericKey(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "alphanumeric_key"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"alphanumeric_key expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < s.length && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        val len = math.min(j - i, 999)
        out.append(('0' + len / 100).toChar)
          .append(('0' + len / 10 % 10).toChar)
          .append(('0' + len % 10).toChar)
          .append(s, i, j)
        i = j
      } else {
        out.append(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): AlphanumericKey =
    copy(child = newChild)
}
