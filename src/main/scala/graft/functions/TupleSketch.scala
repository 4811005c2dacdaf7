package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ArrayOfDoubles "tuple" sketch — the Druid `datasketches-tuple` extension's
  * `arrayOfDoublesSketch` aggregator capability set (upstream DataSketches
  * ArrayOfDoublesSketch): a theta-style distinct-key sample where every
  * retained key carries an ARRAY OF DOUBLE metrics, summed across that key's
  * rows. One sketch therefore answers "how many distinct users AND how much
  * did those users spend" in a single mergeable binary — the per-key
  * attribution theta/HLL can't do.
  *
  * Same KMV construction as [[ThetaSketch]] (k smallest 64-bit hashes,
  * sign-flipped so Long order = unsigned hash order), with a values row
  * per retained hash. Re-adding a RETAINED key sums its values elementwise
  * (the upstream summary "sum" mode — also Druid's); a key beyond θ is
  * dropped values and all. Estimates: exact `size` while under capacity
  * (the SPARSE-EXACT regime — hash-gated oracles live there), else the KMV
  * estimator; metric sums scale by 1/θ the same way.
  *
  * Set ops follow upstream ArrayOfDoublesSetOperationBuilder: UNION sums
  * values for common keys; INTERSECT keeps common keys below θ with both
  * sides' values summed; NOT (aNotB) keeps A's entries absent from B with
  * A's values.
  */
object TupleSketch {

  /** Druid's datasketches-tuple default nominalEntries. */
  val DefaultK = 16384

  final class Buffer(var k: Int, var numValues: Int) {
    var hashes: Array[Long] = new Array[Long](8)
    /** row-major: values(i) is the metrics array of hashes(i) */
    var values: Array[Array[Double]] = new Array[Array[Double]](8)
    var size: Int = 0

    private def ensure(cap: Int): Unit = if (hashes.length < cap) {
      val n = math.min(math.max(cap, hashes.length * 2), math.max(k, cap))
      hashes = java.util.Arrays.copyOf(hashes, n)
      values = java.util.Arrays.copyOf(values, n)
    }

    /** Insert a flipped hash with its metric values, keeping the k smallest
      * distinct keys; an already-retained key SUMS values elementwise. */
    def add(flipped: Long, vals: Array[Double]): Unit = {
      val full = k > 0 && size == k
      // strictly-greater check: equal-to-max must still fall through to the
      // search so the retained max key's values get summed, unlike theta
      // where equal-max is a distinct-only no-op
      if (full && flipped > hashes(size - 1)) return
      var lo = 0; var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (hashes(mid) < flipped) lo = mid + 1 else hi = mid
      }
      if (lo < size && hashes(lo) == flipped) { // retained key: sum values
        val row = values(lo)
        var m = 0
        while (m < numValues) { row(m) += vals(m); m += 1 }
        return
      }
      if (full) { // evict current max (last), insert in place
        System.arraycopy(hashes, lo, hashes, lo + 1, size - lo - 1)
        System.arraycopy(values.asInstanceOf[Array[AnyRef]], lo,
          values.asInstanceOf[Array[AnyRef]], lo + 1, size - lo - 1)
        hashes(lo) = flipped
        values(lo) = vals.clone()
      } else {
        ensure(size + 1)
        System.arraycopy(hashes, lo, hashes, lo + 1, size - lo)
        System.arraycopy(values.asInstanceOf[Array[AnyRef]], lo,
          values.asInstanceOf[Array[AnyRef]], lo + 1, size - lo)
        hashes(lo) = flipped
        values(lo) = vals.clone()
        size += 1
      }
    }

    /** Late width discovery: rows inserted while the width was unknown
      * (null metric arrays only) are zero-width — pad them so every
      * retained row matches `numValues`. */
    def adoptWidth(w: Int): Unit = {
      require(numValues == 0 || numValues == w,
        s"tuple sketch numValues mismatch: $numValues vs $w")
      if (numValues == 0) {
        numValues = w
        var i = 0
        while (i < size) {
          if (values(i).length != w) values(i) = new Array[Double](w)
          i += 1
        }
      }
    }

    def mergeWith(other: Buffer): Unit = {
      // adopt capacity/width (k=0 & numValues=0 sentinel the union agg's
      // empty buffer); when both sides carry a k, the SMALLER bounds the
      // union's accuracy (upstream union semantics)
      if (other.k > 0) k = if (k == 0) other.k else math.min(k, other.k)
      if (other.numValues > 0) adoptWidth(other.numValues)
      if (k > 0 && size > k) size = k // truncate if k shrank
      var i = 0
      while (i < other.size) {
        // a width-less partial (all-null metric arrays) carries zero-width
        // rows — pad to this buffer's width (zeros) before inserting
        val row =
          if (other.values(i).length == numValues) other.values(i)
          else java.util.Arrays.copyOf(other.values(i), numValues)
        add(other.hashes(i), row)
        i += 1
      }
    }

    /** θ as a fraction of the hash space (1.0 while sparse). */
    def theta: Double =
      if (size < k || size == 0) 1.0
      else (hashes(size - 1).toDouble - Long.MinValue.toDouble) / math.pow(2, 64)

    def cut: Long =
      if (size == k && size > 0) hashes(size - 1) else Long.MaxValue
  }

  def estimate(b: Buffer): Double =
    if (b.size == 0 || b.size < b.k) b.size.toDouble
    else (b.k - 1).toDouble / b.theta

  /** Per-metric sums over the retained sample scaled by 1/θ — the
    * `arrayOfDoublesSketchToMetricsSumEstimate` contract (exact while
    * sparse: θ = 1 and the sample IS the population). */
  def metricsSumEstimate(b: Buffer): Array[Double] = {
    val out = new Array[Double](b.numValues)
    var i = 0
    while (i < b.size) {
      val row = b.values(i)
      var m = 0
      while (m < b.numValues) { out(m) += row(m); m += 1 }
      i += 1
    }
    val t = b.theta
    if (t < 1.0) { var m = 0; while (m < b.numValues) { out(m) /= t; m += 1 } }
    out
  }

  /** ver byte | int k | int numValues | int size |
    * size × (long hash + numValues × double), hashes ascending */
  def serialize(b: Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + 4 + b.size * (8 + 8 * b.numValues))
    buf.put(1.toByte).putInt(b.k).putInt(b.numValues).putInt(b.size)
    var i = 0
    while (i < b.size) {
      buf.putLong(b.hashes(i))
      val row = b.values(i)
      var m = 0
      while (m < b.numValues) { buf.putDouble(row(m)); m += 1 }
      i += 1
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 1, "unknown tuple sketch version")
    val b = new Buffer(buf.getInt(), buf.getInt())
    val n = buf.getInt()
    b.hashes = new Array[Long](math.max(n, 8))
    b.values = new Array[Array[Double]](math.max(n, 8))
    var i = 0
    while (i < n) {
      b.hashes(i) = buf.getLong()
      val row = new Array[Double](b.numValues)
      var m = 0
      while (m < b.numValues) { row(m) = buf.getDouble(); m += 1 }
      b.values(i) = row
      i += 1
    }
    b.size = n
    b
  }

  /** UNION / INTERSECT / NOT over serialized sketches (upstream
    * ArrayOfDoublesSetOperationBuilder; summary combine = sum). Exact in
    * the sparse regime; like [[ThetaSetOp]], a SATURATED derived sketch
    * can't carry the θ scale factor in this Buffer form, so downstream
    * estimates read the unscaled sample — stay under k for exact algebra. */
  def setOp(a: Buffer, b: Buffer, op: String): Buffer = {
    require(a.numValues == 0 || b.numValues == 0 || a.numValues == b.numValues,
      s"tuple sketch numValues mismatch: ${a.numValues} vs ${b.numValues}")
    val out = new Buffer(
      if (a.k > 0 && b.k > 0) math.min(a.k, b.k) else math.max(a.k, b.k),
      math.max(a.numValues, b.numValues))
    // width-less inputs (all-NULL metric arrays) carry zero-width rows —
    // pad to the output width like mergeWith does, so set algebra over
    // them neither corrupts the buffer nor throws
    def pad(v: Array[Double]): Array[Double] =
      if (v.length == out.numValues) v
      else java.util.Arrays.copyOf(v, out.numValues)
    op match {
      case "UNION" =>
        out.mergeWith(a); out.mergeWith(b)
      case "INTERSECT" =>
        val cut = math.min(a.cut, b.cut)
        var i = 0; var j = 0
        while (i < a.size && j < b.size) {
          val x = a.hashes(i); val y = b.hashes(j)
          if (x < y) i += 1
          else if (y < x) j += 1
          else {
            if (x <= cut) {
              val row = pad(a.values(i)).clone()
              val other = pad(b.values(j))
              var m = 0
              while (m < out.numValues) { row(m) += other(m); m += 1 }
              out.add(x, row)
            }
            i += 1; j += 1
          }
        }
      case "NOT" =>
        val cut = math.min(a.cut, b.cut)
        var i = 0; var j = 0
        while (i < a.size) {
          val x = a.hashes(i)
          if (x > cut) i = a.size // ascending: nothing more below θ
          else {
            while (j < b.size && b.hashes(j) < x) j += 1
            if (j >= b.size || b.hashes(j) != x) out.add(x, pad(a.values(i)))
            i += 1
          }
        }
      case other => throw new IllegalArgumentException(
        s"tuple sketch set op must be UNION/INTERSECT/NOT, got '$other'")
    }
    out
  }
}

/** `tuple_sketch_agg(key, metrics, k)` — aggregate (string key, array<double>
  * metrics) rows into an ArrayOfDoubles sketch binary. Null keys skip the
  * row (Druid); null metric elements count as 0.0.
  */
case class TupleSketchAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketch.Buffer] with BinaryLike[Expression] {

  override def createAggregationBuffer(): TupleSketch.Buffer =
    new TupleSketch.Buffer(k, 0)

  override def update(buf: TupleSketch.Buffer, input: InternalRow): TupleSketch.Buffer = {
    val key = left.eval(input)
    if (key != null) {
      val arr = right.eval(input)
      // a NULL metrics array counts the key with all-zero values (like
      // null elements — the row still contributes to the distinct count);
      // its width comes from the buffer once known, and zero-width rows
      // inserted before the first non-null array are padded on adoption
      // ([[TupleSketch.Buffer.adoptWidth]])
      val vals: Array[Double] = arr match {
        case a: ArrayData =>
          val n = a.numElements()
          val out = new Array[Double](n)
          var m = 0
          while (m < n) { if (!a.isNullAt(m)) out(m) = a.getDouble(m); m += 1 }
          out
        case _ => new Array[Double](buf.numValues)
      }
      if (buf.numValues == 0 && vals.length > 0) buf.adoptWidth(vals.length)
      require(vals.length == buf.numValues,
        s"tuple_sketch_agg metrics width changed: ${vals.length} vs ${buf.numValues}")
      buf.add(ThetaSketch.hash(key.asInstanceOf[UTF8String]), vals)
    }
    buf
  }

  override def merge(buf: TupleSketch.Buffer, other: TupleSketch.Buffer): TupleSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: TupleSketch.Buffer): Any = TupleSketch.serialize(buf)
  override def serialize(buf: TupleSketch.Buffer): Array[Byte] = TupleSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): TupleSketch.Buffer = TupleSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tuple_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 16)
      TypeCheckResult.TypeCheckFailure(s"tuple_sketch_agg needs k >= 16, got $k")
    else if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"tuple_sketch_agg key expects string (cast first), got ${left.dataType.simpleString}")
    else right.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tuple_sketch_agg metrics expects array<double>, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): TupleSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TupleSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TupleSketchAgg = copy(left = newLeft, right = newRight)
}

/** `tuple_union_agg(sketch)` — union already-serialized tuple sketches
  * (values for common keys sum; the smaller k bounds accuracy). */
case class TupleUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TupleSketch.Buffer =
    new TupleSketch.Buffer(0, 0)

  override def update(buf: TupleSketch.Buffer, input: InternalRow): TupleSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(TupleSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: TupleSketch.Buffer, other: TupleSketch.Buffer): TupleSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: TupleSketch.Buffer): Any = TupleSketch.serialize(buf)
  override def serialize(buf: TupleSketch.Buffer): Array[Byte] = TupleSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): TupleSketch.Buffer = TupleSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tuple_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tuple_union_agg expects binary sketches, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): TupleUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TupleUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TupleUnionAgg =
    copy(child = newChild)
}

/** `tuple_estimate(sketch)` → double distinct-key estimate (exact while
  * sparse — `arrayOfDoublesSketchToEstimate`). */
case class TupleEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tuple_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tuple_estimate expects binary, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    TupleSketch.estimate(TupleSketch.deserialize(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): TupleEstimate =
    copy(child = newChild)
}

/** `tuple_num_entries(sketch)` → long retained-entry count
  * (`arrayOfDoublesSketchToNumEntries`). */
case class TupleNumEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "tuple_num_entries"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tuple_num_entries expects binary, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    TupleSketch.deserialize(input.asInstanceOf[Array[Byte]]).size.toLong
  override protected def withNewChildInternal(newChild: Expression): TupleNumEntries =
    copy(child = newChild)
}

/** `tuple_metrics_sum(sketch)` → array<double> of per-metric sum estimates
  * over the distinct-key population (`…ToMetricsSumEstimate`; exact while
  * sparse). */
case class TupleMetricsSum(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tuple_metrics_sum"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tuple_metrics_sum expects binary, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TupleSketch.metricsSumEstimate(
        TupleSketch.deserialize(input.asInstanceOf[Array[Byte]])))
  override protected def withNewChildInternal(newChild: Expression): TupleMetricsSum =
    copy(child = newChild)
}

/** `tuple_sketch_union/intersect/not(a, b)` → derived tuple SKETCH binary
  * (`arrayOfDoublesSketchSetOp`; values combine by sum — see
  * [[TupleSketch.setOp]]). */
case class TupleSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"tuple_sketch_${op.toLowerCase}"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary, binary)")
  override def nullSafeEval(a: Any, b: Any): Any =
    TupleSketch.serialize(TupleSketch.setOp(
      TupleSketch.deserialize(a.asInstanceOf[Array[Byte]]),
      TupleSketch.deserialize(b.asInstanceOf[Array[Byte]]), op))
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TupleSetOp = copy(left = newLeft, right = newRight)
}
