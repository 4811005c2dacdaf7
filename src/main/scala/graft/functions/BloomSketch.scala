package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a mergeable sketch aggregate — the Druid `bloom` filter
  * aggregator's capability (upstream druid bloom-filter extension) and the
  * 100 TB decontamination prefilter.
  *
  * Why it matters at scale: a benchmark/held-out shingle set can be tens of
  * GBs — too big to broadcast for the exact anti-join. Its Bloom filter is a
  * few hundred KB at 1% false-positive rate, broadcasts to every executor,
  * and filters the training corpus down to (true positives + ~fpp) rows with
  * ZERO false negatives; only that sliver re-joins the exact set. Partials
  * from every partition OR together (map-side combine via the
  * TypedImperativeAggregate contract), so building the filter is one scan.
  *
  * Construction: standard Kirsch–Mitzenmacher double hashing — bit indexes
  * g_i(x) = h1(x) + i·h2(x) mod m for i < numHashes, h1/h2 = XXH64 with
  * distinct seeds (h2 forced odd so stepping cycles the whole table).
  */
object BloomSketch {

  final class Buffer(var numBits: Int, var numHashes: Int) {
    var words: Array[Long] =
      if (numBits == 0) Array.emptyLongArray
      else new Array[Long]((numBits + 63) >>> 6)

    def add(h1: Long, h2: Long): Unit = {
      var i = 0
      while (i < numHashes) {
        val idx = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
        words(idx >>> 6) |= (1L << (idx & 63))
        i += 1
      }
    }

    def mightContain(h1: Long, h2: Long): Boolean = {
      if (numBits == 0) return false
      var i = 0
      while (i < numHashes) {
        val idx = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
        if ((words(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
        i += 1
      }
      true
    }

    def mergeWith(o: Buffer): Unit = {
      if (o.numBits == 0) return
      if (numBits == 0) {
        numBits = o.numBits; numHashes = o.numHashes; words = o.words.clone()
        return
      }
      require(numBits == o.numBits && numHashes == o.numHashes,
        s"bloom shape mismatch: ($numBits,$numHashes) vs (${o.numBits},${o.numHashes})")
      var i = 0
      while (i < words.length) { words(i) |= o.words(i); i += 1 }
    }

    def setBits: Long = {
      var s = 0L; var i = 0
      while (i < words.length) { s += java.lang.Long.bitCount(words(i)); i += 1 }
      s
    }

    /** Observed false-positive probability ≈ (fraction of set bits)^k. */
    def fpEstimate: Double =
      if (numBits == 0) 0.0
      else math.pow(setBits.toDouble / numBits, numHashes.toDouble)
  }

  def hash1(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** Second seed; forced odd so g_i steps hit every residue mod m. */
  def hash2(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes,
      0x9E3779B97F4A7C15L) | 1L

  /** m = −n·ln p / (ln 2)² — textbook optimal size. */
  def optimalBits(expectedItems: Long, fpp: Double): Int = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))
    math.min(math.max(m.ceil.toLong, 64L), Int.MaxValue.toLong - 64).toInt
  }

  /** k = m/n · ln 2. */
  def optimalHashes(expectedItems: Long, bits: Long): Int =
    math.max(1, math.round(bits.toDouble / expectedItems * math.log(2)).toInt)

  /** ver byte | int numBits | int numHashes | ceil(numBits/64) × long */
  def serialize(b: Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + b.words.length * 8)
    buf.put(1.toByte).putInt(b.numBits).putInt(b.numHashes)
    var i = 0
    while (i < b.words.length) { buf.putLong(b.words(i)); i += 1 }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 1, "unknown bloom sketch version")
    val b = new Buffer(buf.getInt(), buf.getInt())
    var i = 0
    while (i < b.words.length) { b.words(i) = buf.getLong(); i += 1 }
    b
  }
}

/** `bloom_agg(value, numBits, numHashes)` — build a Bloom filter binary over
  * string values (partials OR'd map-side, mirroring the other sketch aggs).
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomSketch.Buffer =
    new BloomSketch.Buffer(numBits, numHashes)

  override def update(buf: BloomSketch.Buffer, input: InternalRow): BloomSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.add(BloomSketch.hash1(s), BloomSketch.hash2(s))
    }
    buf
  }

  override def merge(buf: BloomSketch.Buffer, other: BloomSketch.Buffer): BloomSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: BloomSketch.Buffer): Any = BloomSketch.serialize(buf)
  override def serialize(buf: BloomSketch.Buffer): Array[Byte] = BloomSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): BloomSketch.Buffer = BloomSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects string input (cast first), got ${child.dataType.simpleString}")
    else if (numBits < 64 || numHashes < 1 || numHashes > 32)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg needs numBits >= 64 and 1 <= numHashes <= 32, got ($numBits, $numHashes)")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_union_agg(sketch)` — OR already-serialized filters (cross-batch
  * re-merge through the segment store, like `hll_union_agg`/`theta_union_agg`).
  */
case class BloomUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomSketch.Buffer = new BloomSketch.Buffer(0, 0)

  override def update(buf: BloomSketch.Buffer, input: InternalRow): BloomSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(BloomSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: BloomSketch.Buffer, other: BloomSketch.Buffer): BloomSketch.Buffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: BloomSketch.Buffer): Any = BloomSketch.serialize(buf)
  override def serialize(buf: BloomSketch.Buffer): Array[Byte] = BloomSketch.serialize(buf)
  override def deserialize(b: Array[Byte]): BloomSketch.Buffer = BloomSketch.deserialize(b)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_union_agg expects binary sketches, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomUnionAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(filter, value)` → boolean; false ⇒ DEFINITELY absent
  * (no false negatives). The filter side is normally a broadcast literal —
  * the deserialized bit array is cached by reference so each task parses the
  * binary once, not per row.
  *
  * Sizing note: a literal filter rides in the serialized plan, fine to a few
  * MB (1 % fpp ≈ 1.2 MB per 10⁶ items). A multi-GB filter should instead be
  * re-sharded: partition the key space (`pmod(xxhash64(s), N)`), build N
  * filters, and join probe rows to their shard's filter — each executor then
  * holds 1/N of the bits.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedBuf: BloomSketch.Buffer = _

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (binary, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(b: Any, v: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedRef)) {
      cachedBuf = BloomSketch.deserialize(bytes)
      cachedRef = bytes
    }
    val s = v.asInstanceOf[UTF8String]
    cachedBuf.mightContain(BloomSketch.hash1(s), BloomSketch.hash2(s))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomMightContain = copy(left = newLeft, right = newRight)
}
