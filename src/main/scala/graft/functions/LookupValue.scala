package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `LOOKUP()` over a LARGE registered map: O(1) probe of a broadcast
  * java HashMap, inside whole-stage codegen. The broadcast ships the map
  * once per executor (torrent), instead of once per task closure (an
  * `addReferenceObj`-only map) or once per plan tree (a `CreateMap`
  * literal, which `GetMapValue` would also probe O(n) per row). Missing
  * key → null, upstream's rule. `name`/`version` give the expression
  * value-level identity (Broadcast has reference equality only) — two
  * LOOKUPs of the same registered version are semantically equal, and a
  * re-registered lookup is not.
  */
case class LookupValue(child: Expression, name: String, version: Long,
    bc: Broadcast[java.util.HashMap[String, String]])
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lookup"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lookup expects a string key, got ${child.dataType.simpleString}")

  override def nullSafeEval(key: Any): Any = {
    val v = bc.value.get(key.toString)
    if (v == null) null else UTF8String.fromString(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lookupBc", bc)
    nullSafeCodeGen(ctx, ev, key => {
      s"""
         |Object lv = ((java.util.HashMap) $bcRef.value()).get($key.toString());
         |if (lv == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = UTF8String.fromString((String) lv);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LookupValue =
    copy(child = newChild)
}
