package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable STORED histogram sketch — the storage form of the reference's
  * `approxHistogram` aggregator (upstream metricsSpec, SURVEY §2.4: Druid
  * stores the histogram sketch in the segment, not finalized quantiles, so
  * partial rollups re-merge losslessly across batches and compactions).
  *
  * The sketch is the classic streaming centroid histogram (Ben-Haim &
  * Tom-Toby, "A Streaming Parallel Decision Tree Algorithm", JMLR 2010 —
  * the same construction Druid's ApproximateHistogram uses): at most k
  * (centroid, count) bins kept sorted by centroid; inserting into a full
  * sketch merges the two closest adjacent bins (weighted mean, leftmost tie).
  * Merge of two sketches is bin-wise insertion followed by the same
  * compaction — commutative and associative while under capacity.
  *
  * SPARSE-EXACT regime: with ≤ k distinct input values no compaction ever
  * fires, bins are exactly the (value, count) multiset, and the lower-rank
  * quantile (smallest centroid with cumulative count ≥ ⌈q·N⌉) equals the
  * element at 1-based rank ⌈q·N⌉ of the sorted multiset — which a SQL oracle
  * can compute with a rank window. That is the hash-gated regime; over
  * capacity the sketch is approximate (the 100 TB path: O(k) state per
  * group, one binary column per segment row).
  */
object HistSketch {

  /** Bin-bounded histogram buffer. `k == 0` is the "adopt from first merged
    * sketch" sentinel used by the merge aggregator (it learns k from its
    * inputs; an all-null group stays empty).
    */
  final class Buffer(var k: Int) {
    var centroids: Array[Double] = new Array[Double](math.max(k + 1, 8))
    var counts: Array[Long] = new Array[Long](math.max(k + 1, 8))
    var size: Int = 0

    private def ensure(cap: Int): Unit = if (centroids.length < cap) {
      centroids = java.util.Arrays.copyOf(centroids, math.max(cap, centroids.length * 2))
      counts = java.util.Arrays.copyOf(counts, math.max(cap, counts.length * 2))
    }

    /** Insert weight `w` at value `v`; compacts when over capacity. */
    def add(v: Double, w: Long): Unit = {
      var lo = 0; var hi = size
      while (lo < hi) { // lower-bound binary search
        val mid = (lo + hi) >>> 1
        if (centroids(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < size && centroids(lo) == v) { counts(lo) += w; return }
      ensure(size + 1)
      System.arraycopy(centroids, lo, centroids, lo + 1, size - lo)
      System.arraycopy(counts, lo, counts, lo + 1, size - lo)
      centroids(lo) = v; counts(lo) = w; size += 1
      if (k > 0 && size > k) compactOnce()
    }

    /** Merge the two closest adjacent bins (weighted mean, leftmost tie). */
    private def compactOnce(): Unit = {
      var best = 0; var bestGap = Double.PositiveInfinity; var i = 0
      while (i < size - 1) {
        val gap = centroids(i + 1) - centroids(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val n = counts(best) + counts(best + 1)
      centroids(best) =
        (centroids(best) * counts(best) + centroids(best + 1) * counts(best + 1)) / n
      counts(best) = n
      System.arraycopy(centroids, best + 2, centroids, best + 1, size - best - 2)
      System.arraycopy(counts, best + 2, counts, best + 1, size - best - 2)
      size -= 1
    }

    def mergeWith(other: Buffer): Unit = {
      if (other.k > k) k = other.k // adopt capacity from inputs (sentinel k=0)
      var i = 0
      while (i < other.size) { add(other.centroids(i), other.counts(i)); i += 1 }
      while (k > 0 && size > k) compactOnce()
    }

    def totalCount: Long = { var s = 0L; var i = 0; while (i < size) { s += counts(i); i += 1 }; s }
  }

  /** version byte | int k | int size | size×double centroids | size×long counts */
  def serialize(b: Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + b.size * 16)
    buf.put(1.toByte).putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.centroids(i)); i += 1 }
    i = 0
    while (i < b.size) { buf.putLong(b.counts(i)); i += 1 }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val ver = buf.get()
    require(ver == 1, s"unknown hist sketch version $ver")
    val b = new Buffer(buf.getInt())
    val n = buf.getInt()
    b.centroids = new Array[Double](math.max(n, 8))
    b.counts = new Array[Long](math.max(n, 8))
    var i = 0
    while (i < n) { b.centroids(i) = buf.getDouble(); i += 1 }
    i = 0
    while (i < n) { b.counts(i) = buf.getLong(); i += 1 }
    b.size = n
    b
  }

  /** Lower-rank quantiles: for each q, the smallest centroid whose cumulative
    * count reaches ⌈q·N⌉ (≥ 1). Exact in the sparse regime; the standard
    * estimator otherwise. Null for an empty sketch.
    */
  def quantiles(b: Buffer, probs: Array[Double]): Array[Double] = {
    val n = b.totalCount
    if (n == 0 || b.size == 0) return null
    probs.map { q =>
      val rank = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L; var i = 0; var out = b.centroids(b.size - 1)
      var found = false
      while (i < b.size && !found) {
        cum += b.counts(i)
        if (cum >= rank) { out = b.centroids(i); found = true }
        i += 1
      }
      out
    }
  }

  /** Normalized ranks: for each x, (centroid mass with value ≤ x) / N —
    * the INCLUSIVE convention (DataSketches' default search criterion).
    * Exact in the sparse regime where every centroid is an exact value;
    * the centroid-mass estimate otherwise. Null for an empty sketch. */
  def ranks(b: Buffer, xs: Array[Double]): Array[Double] = {
    val n = b.totalCount
    if (n == 0 || b.size == 0) return null
    xs.map { x =>
      var cum = 0L; var i = 0
      while (i < b.size && b.centroids(i) <= x) { cum += b.counts(i); i += 1 }
      cum.toDouble / n
    }
  }

  /** Histogram counts over split points (DataSketches getPMF with the
    * default INCLUSIVE search criterion, scaled to counts): m splits →
    * m+1 bins [min, s1], (s1, s2], …, (sm, max] — mass exactly on a split
    * lands in the LOWER bin, so bin sums reconcile with [[ranks]]/CDF
    * (mass ≤ x) at every split point. Splits must be strictly increasing.
    * Null for an empty sketch. */
  def pmf(b: Buffer, splits: Array[Double]): Array[Double] = {
    val n = b.totalCount
    if (n == 0 || b.size == 0) return null
    require(splits.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "histogram split points must be strictly increasing")
    val out = new Array[Double](splits.length + 1)
    var i = 0
    while (i < b.size) {
      val v = b.centroids(i)
      var bin = 0
      while (bin < splits.length && v > splits(bin)) bin += 1
      out(bin) += b.counts(i).toDouble
      i += 1
    }
    out
  }
}

/** Aggregate raw double values into a serialized histogram sketch (binary).
  * Registered as `hist_sketch_agg(value, k)`; partial/final split and
  * map-side combine come from the TypedImperativeAggregate contract — the
  * buffer travels between stages in the same binary form it is stored in.
  */
case class HistSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): HistSketch.Buffer = new HistSketch.Buffer(k)

  override def update(buf: HistSketch.Buffer, input: InternalRow): HistSketch.Buffer = {
    val v = child.eval(input)
    // NaN is skipped like null: it has no rank, and one NaN would break the
    // sorted-centroid invariant (every comparison false), silently
    // corrupting the whole group's quantiles
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.add(d, 1L)
    }
    buf
  }

  override def merge(buf: HistSketch.Buffer, other: HistSketch.Buffer): HistSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: HistSketch.Buffer): Any = HistSketch.serialize(buf)
  override def serialize(buf: HistSketch.Buffer): Array[Byte] = HistSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): HistSketch.Buffer = HistSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hist_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && k >= 2) TypeCheckResult.TypeCheckSuccess
    else if (k < 2) TypeCheckResult.TypeCheckFailure(s"hist_sketch_agg needs k >= 2, got $k")
    else TypeCheckResult.TypeCheckFailure(
      s"hist_sketch_agg expects double input, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSketchAgg =
    copy(child = newChild)
}

/** Union already-serialized sketches (binary → binary) — the read-side merge
  * of stored partials, `hll_union_agg`'s histogram analog. Capacity is
  * adopted from the inputs (largest k wins), so the merge agg needs no
  * parameter of its own.
  */
case class HistSketchMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): HistSketch.Buffer = new HistSketch.Buffer(0)

  override def update(buf: HistSketch.Buffer, input: InternalRow): HistSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(HistSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: HistSketch.Buffer, other: HistSketch.Buffer): HistSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: HistSketch.Buffer): Any = HistSketch.serialize(buf)
  override def serialize(buf: HistSketch.Buffer): Array[Byte] = HistSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): HistSketch.Buffer = HistSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hist_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_merge_agg expects binary sketches, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSketchMergeAgg =
    copy(child = newChild)
}

/** Finalize: `hist_quantiles(sketch, array(probs))` → array<double> of
  * lower-rank quantile estimates (null for an empty sketch).
  */
case class HistQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hist_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hist_quantiles expects (binary, array<double>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(sketch: Any, probs: Any): Any = {
    val buf = HistSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    val qs = HistSketch.quantiles(buf, probs.asInstanceOf[ArrayData].toDoubleArray())
    if (qs == null) null else new GenericArrayData(qs)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HistQuantiles = copy(left = newLeft, right = newRight)
}

/** Finalize: `hist_ranks(sketch, array(xs))` → array<double> of normalized
  * INCLUSIVE ranks (fraction of mass ≤ x; null for an empty sketch). */
case class HistRanks(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hist_ranks"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hist_ranks expects (binary, array<double>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(sketch: Any, xs: Any): Any = {
    val buf = HistSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    val rs = HistSketch.ranks(buf, xs.asInstanceOf[ArrayData].toDoubleArray())
    if (rs == null) null else new GenericArrayData(rs)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HistRanks = copy(left = newLeft, right = newRight)
}

/** Finalize: `hist_pmf(sketch, array(splits))` → array<double> of histogram
  * COUNTS over the m+1 (left, right] bins the split points define (getPMF
  * inclusive convention, scaled by N; null for an empty sketch). */
case class HistPmf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hist_pmf"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hist_pmf expects (binary, array<double>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(sketch: Any, splits: Any): Any = {
    val buf = HistSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    val cs = HistSketch.pmf(buf, splits.asInstanceOf[ArrayData].toDoubleArray())
    if (cs == null) null else new GenericArrayData(cs)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HistPmf = copy(left = newLeft, right = newRight)
}
