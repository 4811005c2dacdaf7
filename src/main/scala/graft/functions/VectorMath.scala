package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact-distance kernels for the ANN surface — ONE definition each
  * for the driver-side and column-expression squared-L2 (review finding
  * r8: these were independently re-implemented in IvfIndex, IvfPq and
  * PqIndex; a NaN-handling or casting fix in one silently missed the
  * others). */
object VectorMath {

  /** Driver-side squared L2 over the common-length prefix. */
  def l2sqLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Exact squared-L2 column between an array<float> column and a query
    * literal (both cast to double element-wise). */
  def l2sqCol(vec: Column, qLit: Column): Column =
    aggregate(
      zip_with(vec, qLit,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, x) => a + x)
}
