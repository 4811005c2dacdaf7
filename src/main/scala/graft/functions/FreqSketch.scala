package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items sketch — the Druid DataSketches `frequentItems` aggregator
  * capability (heavy hitters / approximate top-K over unbounded domains,
  * SURVEY §2.4 sketch family).
  *
  * Misra–Gries construction with k counters: any item whose true frequency
  * exceeds n/(k+1) is guaranteed present; counts are lower bounds within
  * n/(k+1). MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS'12):
  * merge = pointwise counter sum, then subtract the (k+1)-th largest counter
  * and drop non-positives — same error bound as a single-pass build, so
  * partials combine map-side and re-merge through the segment store like the
  * other sketch binaries.
  *
  * SPARSE-EXACT regime: while distinct items ≤ k no decrement ever fires, so
  * counts are exact and order-independent — the hash-gated oracle path.
  */
object FreqSketch {

  final class Buffer(var k: Int) {
    val counts = new java.util.HashMap[String, Long]()

    def add(item: String, w: Long = 1L): Unit = {
      val cur = counts.get(item)
      if (cur != 0L) counts.put(item, cur + w)
      else if (counts.size < k) counts.put(item, w)
      else {
        // Misra–Gries decrement: reduce every counter by the new item's
        // weight (usually 1), dropping zeros; the remainder, if any, becomes
        // the item's count
        val it = counts.entrySet().iterator()
        var minOver = Long.MaxValue
        while (it.hasNext) { minOver = math.min(minOver, it.next().getValue) }
        val dec = math.min(w, minOver)
        val it2 = counts.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          val nv = e.getValue - dec
          if (nv <= 0L) it2.remove() else e.setValue(nv)
        }
        if (w > dec) add(item, w - dec)
      }
    }

    def mergeWith(o: Buffer): Unit = {
      if (o.k > 0) k = if (k == 0) o.k else math.min(k, o.k)
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      trim()
    }

    /** Keep ≤ k counters: subtract the (k+1)-th largest value from all,
      * drop non-positives (the mergeable-summaries rule). */
    def trim(): Unit = if (k > 0 && counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val it = counts.values().iterator()
      while (it.hasNext) { vals(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val it2 = counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - cut
        if (nv <= 0L) it2.remove() else e.setValue(nv)
      }
    }

    /** (item, count) sorted by count desc, item asc — deterministic. */
    def topK(n: Int): Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      counts.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue))
        .sortBy { case (item, c) => (-c, item) }
        .take(n)
    }
  }

  /** ver byte | int k | int size | size × (int len, utf8 bytes, long count)
    * in deterministic (count desc, item asc) order. */
  def serialize(b: Buffer): Array[Byte] = {
    val entries = b.topK(Int.MaxValue)
    val payload = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 1 + 4 + 4 + entries.zip(payload).map(e => 4 + e._2.length + 8).sum
    val buf = ByteBuffer.allocate(size)
    buf.put(1.toByte).putInt(b.k).putInt(entries.size)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      buf.putInt(bytes.length).put(bytes).putLong(c)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 1, "unknown freq sketch version")
    val b = new Buffer(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) {
      val len = buf.getInt()
      val arr = new Array[Byte](len)
      buf.get(arr)
      b.counts.put(new String(arr, StandardCharsets.UTF_8), buf.getLong())
      i += 1
    }
    b
  }
}

/** `freq_sketch_agg(item, k)` — build a Misra–Gries heavy-hitters sketch. */
case class FreqSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): FreqSketch.Buffer = new FreqSketch.Buffer(k)

  override def update(buf: FreqSketch.Buffer, input: InternalRow): FreqSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqSketch.Buffer, other: FreqSketch.Buffer): FreqSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: FreqSketch.Buffer): Any = FreqSketch.serialize(buf)
  override def serialize(buf: FreqSketch.Buffer): Array[Byte] = FreqSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): FreqSketch.Buffer = FreqSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg expects string input (cast first), got ${child.dataType.simpleString}")
    else if (k < 1 || k > 1000000) TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg needs 1 <= k <= 1e6, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** `freq_merge_agg(sketch)` — re-merge serialized sketches (segment store). */
case class FreqMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): FreqSketch.Buffer = new FreqSketch.Buffer(0)

  override def update(buf: FreqSketch.Buffer, input: InternalRow): FreqSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(FreqSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: FreqSketch.Buffer, other: FreqSketch.Buffer): FreqSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: FreqSketch.Buffer): Any = FreqSketch.serialize(buf)
  override def serialize(buf: FreqSketch.Buffer): Array[Byte] = FreqSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): FreqSketch.Buffer = FreqSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_merge_agg expects binary sketches, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** `freq_topk(sketch, n)` → array<struct<item, cnt>> — count desc, item asc. */
case class FreqTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_topk expects (binary, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(sk: Any, n: Any): Any = {
    val top = FreqSketch.deserialize(sk.asInstanceOf[Array[Byte]])
      .topK(n.asInstanceOf[Int])
    new GenericArrayData(top.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any]): ArrayData
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FreqTopK = copy(left = newLeft, right = newRight)
}
