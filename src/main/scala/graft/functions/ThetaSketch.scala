package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta/KMV sketch — the Druid `thetaSketch` aggregator's capability set
  * (upstream DataSketches theta: approximate distinct counts that also
  * support SET ALGEBRA — intersections and differences — which HLL cannot;
  * SURVEY §2.4 sketch family, classic audience-overlap use).
  *
  * K-minimum-values construction: keep the k smallest 64-bit hashes of the
  * inputs. Union = merge + truncate (still the k smallest of the union).
  * Estimate: exact `size` while under capacity (SPARSE-EXACT regime — the
  * hash-gated oracle path), else the standard KMV estimator (k−1)/θ where θ
  * is the k-th smallest hash as a fraction of the hash space. Intersection
  * (theta style): restrict both sketches to hashes below θ = min(θ_a, θ_b)
  * and scale the common count by 1/θ — exact when both sketches are sparse.
  *
  * Hashes are stored sign-flipped (`h ^ Long.MinValue`) so natural Long
  * order equals unsigned hash order.
  */
object ThetaSketch {

  final class Buffer(var k: Int) {
    var hashes: Array[Long] = new Array[Long](math.min(math.max(k, 8), 64))
    var size: Int = 0

    private def ensure(cap: Int): Unit = if (hashes.length < cap)
      hashes = java.util.Arrays.copyOf(hashes, math.min(math.max(cap, hashes.length * 2), math.max(k, cap)))

    /** Insert a flipped hash, keeping the k smallest distinct values. */
    def add(flipped: Long): Unit = {
      val full = k > 0 && size == k
      if (full && flipped >= hashes(size - 1)) return
      var lo = 0; var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (hashes(mid) < flipped) lo = mid + 1 else hi = mid
      }
      if (lo < size && hashes(lo) == flipped) return // distinct-only
      if (full) { // evict current max (last), insert in place
        System.arraycopy(hashes, lo, hashes, lo + 1, size - lo - 1)
        hashes(lo) = flipped
      } else {
        ensure(size + 1)
        System.arraycopy(hashes, lo, hashes, lo + 1, size - lo)
        hashes(lo) = flipped
        size += 1
      }
    }

    def mergeWith(other: Buffer): Unit = {
      // adopt capacity (sentinel k=0 on the union agg's empty buffer); when
      // both sides carry a k, the SMALLER bounds the union's accuracy
      if (other.k > 0) k = if (k == 0) other.k else math.min(k, other.k)
      if (k > 0 && size > k) size = k // truncate if k shrank
      var i = 0
      while (i < other.size) { add(other.hashes(i)); i += 1 }
    }

    /** θ as a fraction of the hash space (1.0 while sparse). */
    def theta: Double =
      if (size < k || size == 0) 1.0
      else (hashes(size - 1).toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
  }

  def hash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L) ^ Long.MinValue

  def estimate(b: Buffer): Double =
    if (b.size == 0 || b.size < b.k) b.size.toDouble
    else (b.k - 1).toDouble / b.theta

  /** Theta intersection estimate: |{common hashes < θ}| / θ, θ = min. */
  def intersectEstimate(a: Buffer, b: Buffer): Double = {
    val cutA = if (a.size == a.k && a.size > 0) a.hashes(a.size - 1) else Long.MaxValue
    val cutB = if (b.size == b.k && b.size > 0) b.hashes(b.size - 1) else Long.MaxValue
    val cut = math.min(cutA, cutB)
    var i = 0; var j = 0; var common = 0
    while (i < a.size && j < b.size) {
      val x = a.hashes(i); val y = b.hashes(j)
      if (x < y) i += 1
      else if (y < x) j += 1
      else { if (x <= cut) common += 1; i += 1; j += 1 }
    }
    val theta = math.min(a.theta, b.theta)
    if (theta >= 1.0) common.toDouble else common.toDouble / theta
  }

  /** Theta difference estimate |A ∖ B|: A's hashes below θ that B lacks,
    * scaled by 1/θ — exact when both sketches are sparse.
    */
  def differenceEstimate(a: Buffer, b: Buffer): Double = {
    val cutA = if (a.size == a.k && a.size > 0) a.hashes(a.size - 1) else Long.MaxValue
    val cutB = if (b.size == b.k && b.size > 0) b.hashes(b.size - 1) else Long.MaxValue
    val cut = math.min(cutA, cutB)
    var i = 0; var j = 0; var only = 0
    while (i < a.size) {
      val x = a.hashes(i)
      if (x > cut) { i = a.size } // beyond θ: stop (ascending order)
      else {
        while (j < b.size && b.hashes(j) < x) j += 1
        if (j >= b.size || b.hashes(j) != x) only += 1
        i += 1
      }
    }
    val theta = math.min(a.theta, b.theta)
    if (theta >= 1.0) only.toDouble else only.toDouble / theta
  }

  /** ver byte | int k | int size | size × long (flipped hashes, ascending) */
  def serialize(b: Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + b.size * 8)
    buf.put(1.toByte).putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putLong(b.hashes(i)); i += 1 }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 1, "unknown theta sketch version")
    val b = new Buffer(buf.getInt())
    val n = buf.getInt()
    b.hashes = new Array[Long](math.max(n, 8))
    var i = 0
    while (i < n) { b.hashes(i) = buf.getLong(); i += 1 }
    b.size = n
    b
  }
}

/** `theta_sketch_agg(value, k)` — aggregate string values into a KMV sketch
  * binary (map-side partial + merge via the TypedImperativeAggregate
  * contract, like the histogram sketch).
  */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): ThetaSketch.Buffer = new ThetaSketch.Buffer(k)

  override def update(buf: ThetaSketch.Buffer, input: InternalRow): ThetaSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(ThetaSketch.hash(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(buf: ThetaSketch.Buffer, other: ThetaSketch.Buffer): ThetaSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: ThetaSketch.Buffer): Any = ThetaSketch.serialize(buf)
  override def serialize(buf: ThetaSketch.Buffer): Array[Byte] = ThetaSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): ThetaSketch.Buffer = ThetaSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 16) TypeCheckResult.TypeCheckSuccess
    else if (k < 16) TypeCheckResult.TypeCheckFailure(s"theta_sketch_agg needs k >= 16, got $k")
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects string input (cast first), got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sketch)` — union already-serialized sketches. */
case class ThetaUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): ThetaSketch.Buffer = new ThetaSketch.Buffer(0)

  override def update(buf: ThetaSketch.Buffer, input: InternalRow): ThetaSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(ThetaSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: ThetaSketch.Buffer, other: ThetaSketch.Buffer): ThetaSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: ThetaSketch.Buffer): Any = ThetaSketch.serialize(buf)
  override def serialize(buf: ThetaSketch.Buffer): Array[Byte] = ThetaSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): ThetaSketch.Buffer = ThetaSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects binary sketches, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `theta_estimate(sketch)` → double distinct-count estimate (exact while
  * the sketch is sparse).
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects binary, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    ThetaSketch.estimate(ThetaSketch.deserialize(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect(a, b)` → double estimate of |A ∩ B| — the set-algebra
  * capability HLL lacks (exact while both sketches are sparse).
  */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("theta_intersect expects (binary, binary)")
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketch.intersectEstimate(
      ThetaSketch.deserialize(a.asInstanceOf[Array[Byte]]),
      ThetaSketch.deserialize(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaIntersect = copy(left = newLeft, right = newRight)
}

/** `theta_difference(a, b)` → double estimate of |A ∖ B| (Druid theta
  * set-op `NOT`; exact while both sketches are sparse).
  */
case class ThetaDifference(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_difference"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("theta_difference expects (binary, binary)")
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketch.differenceEstimate(
      ThetaSketch.deserialize(a.asInstanceOf[Array[Byte]]),
      ThetaSketch.deserialize(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaDifference = copy(left = newLeft, right = newRight)
}

/** `theta_set_op(a, b, op)` → a derived theta SKETCH binary (not an
  * estimate): the Druid SQL `THETA_SKETCH_INTERSECT` / `THETA_SKETCH_NOT`
  * contract, whose result feeds `THETA_SKETCH_ESTIMATE` or further set ops.
  * The derived sketch keeps the hashes below θ = min(θ_a, θ_b) that satisfy
  * the op, with k = min(k_a, k_b) — exact in the sparse regime (both inputs
  * under capacity). In the SATURATED regime the serialized Buffer form
  * cannot carry the θ scale factor, so a downstream estimate reads as the
  * unscaled sample count — the scalar estimate ops ([[ThetaIntersect]],
  * [[ThetaDifference]]) are the accurate saturated path; use them when
  * cardinalities approach k.
  */
case class ThetaSetOp(left: Expression, right: Expression, intersect: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (intersect) "theta_sketch_intersect" else "theta_sketch_not"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary, binary)")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = ThetaSketch.deserialize(a.asInstanceOf[Array[Byte]])
    val y = ThetaSketch.deserialize(b.asInstanceOf[Array[Byte]])
    val cutX = if (x.size == x.k && x.size > 0) x.hashes(x.size - 1) else Long.MaxValue
    val cutY = if (y.size == y.k && y.size > 0) y.hashes(y.size - 1) else Long.MaxValue
    val cut = math.min(cutX, cutY)
    val out = new ThetaSketch.Buffer(
      if (x.k > 0 && y.k > 0) math.min(x.k, y.k) else math.max(x.k, y.k))
    var i = 0; var j = 0
    if (intersect) {
      while (i < x.size && j < y.size) {
        val hx = x.hashes(i); val hy = y.hashes(j)
        if (hx < hy) i += 1
        else if (hy < hx) j += 1
        else { if (hx <= cut) out.add(hx); i += 1; j += 1 }
      }
    } else {
      while (i < x.size) {
        val hx = x.hashes(i)
        if (hx > cut) i = x.size // ascending: nothing more below θ
        else {
          while (j < y.size && y.hashes(j) < hx) j += 1
          if (j >= y.size || y.hashes(j) != hx) out.add(hx)
          i += 1
        }
      }
    }
    ThetaSketch.serialize(out)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaSetOp = copy(left = newLeft, right = newRight)
}

/** `theta_sketch_union(a, b)` → serialized UNION sketch (the scalar twin of
  * [[ThetaUnionAgg]], completing Druid's THETA_SKETCH_UNION set op).
  * `mergeWith` keeps the k smallest of both inputs — exact in the sparse
  * regime like the other serialized set ops. */
case class ThetaSketchUnion(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_union"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("theta_sketch_union expects (binary, binary)")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = ThetaSketch.deserialize(a.asInstanceOf[Array[Byte]])
    x.mergeWith(ThetaSketch.deserialize(b.asInstanceOf[Array[Byte]]))
    ThetaSketch.serialize(x)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaSketchUnion = copy(left = newLeft, right = newRight)
}
