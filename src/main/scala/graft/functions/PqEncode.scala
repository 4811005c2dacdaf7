package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encode: nearest codeword (squared L2, first-min tiebreak) per
  * subspace over a full codebook — `pq_encode(vec, codebook) → array<int>`
  * with m = codebook length, subDim = codebook[j][c] length.
  *
  * Why an Expression: the HOF form (a `transform` over ks codewords, each
  * an `aggregate`∘`zip_with` fold) evaluates interpreted lambdas per
  * CODEWORD per subspace per row — workable at the r9 default ks=16, but
  * the standard PQ setting is ks=256 codewords/subspace (Jégou et al.,
  * TPAMI 2011: 8 bits/subquantizer), where the interpreted form does
  * m·ks·subDim ≈ 16k lambda evaluations per row. This fuses the whole
  * argmin into one branch-light loop (the AdcDistance pattern), making
  * ks=256 training/encode affordable at corpus scale.
  *
  * Accepts float OR double vectors (PqIndex trains raw embeddings as float
  * and IVFADC residuals as double). Codebook must be
  * array<array<array<double>>>. A vector shorter than m·subDim yields null
  * (corrupted input — consistent with the engine's bad-record contract);
  * null codebook cells yield null.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  private def vecElem: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  private def vecOk: Boolean = vecElem match {
    case FloatType | DoubleType => true
    case _ => false
  }
  private def cbOk: Boolean = right.dataType match {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float|double>, array<array<array<double>>>)," +
        s" got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private val isFloat: Boolean = vecElem == FloatType

  override def nullSafeEval(v: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    val m = cb.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Int])
    if (cb.isNullAt(0)) return null
    val sub0 = cb.getArray(0)
    if (sub0.numElements() == 0 || sub0.isNullAt(0)) return null
    val subDim = sub0.getArray(0).numElements()
    if (vec.numElements() < m * subDim) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      if (cb.isNullAt(j)) return null
      val codes = cb.getArray(j)
      val ks = codes.numElements()
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < ks) {
        if (codes.isNullAt(k)) return null
        val cw = codes.getArray(k)
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val x = if (isFloat) vec.getFloat(j * subDim + d).toDouble
                  else vec.getDouble(j * subDim + d)
          val diff = x - cw.getDouble(d)
          s += diff * diff
          d += 1
        }
        if (s < bestD) { bestD = s; best = k }
        k += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val m = ctx.freshName("m")
      val subDim = ctx.freshName("subDim")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val codes = ctx.freshName("codes")
      val cw = ctx.freshName("cw")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val sub0 = ctx.freshName("sub0")
      val getX =
        if (isFloat) s"(double) $v.getFloat($j * $subDim + $d)"
        else s"$v.getDouble($j * $subDim + $d)"
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |int $m = $c.numElements();
         |int $subDim = 0;
         |int[] $out = new int[$m];
         |if ($m > 0) {
         |  if ($c.isNullAt(0)) { ${ev.isNull} = true; }
         |  else {
         |    $ad $sub0 = $c.getArray(0);
         |    if ($sub0.numElements() == 0 || $sub0.isNullAt(0)) { ${ev.isNull} = true; }
         |    else { $subDim = $sub0.getArray(0).numElements(); }
         |  }
         |  if (!${ev.isNull} && $v.numElements() < $m * $subDim) { ${ev.isNull} = true; }
         |}
         |for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |  if ($c.isNullAt($j)) { ${ev.isNull} = true; continue; }
         |  $ad $codes = $c.getArray($j);
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $k = 0; $k < $codes.numElements() && !${ev.isNull}; $k++) {
         |    if ($codes.isNullAt($k)) { ${ev.isNull} = true; continue; }
         |    $ad $cw = $codes.getArray($k);
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      double $diff = $getX - $cw.getDouble($d);
         |      $s += $diff * $diff;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $k; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}
