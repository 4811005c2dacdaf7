package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media-header decoding for the multimodal surface — the formats
  * whose metadata is pure byte arithmetic need no codec library, so they
  * are parsed for real instead of stubbed ([[MultimodalFunctions]]
  * documents the stub contract for formats that DO need codecs):
  *
  *  - WAV (RIFF/WAVE): chunk walk (fmt / data with odd-size padding, like
  *    any real RIFF reader) → sample_rate, channels, bits_per_sample,
  *    data_bytes, duration_ms from the DECLARED byte rate;
  *  - BMP (BITMAPINFOHEADER): little-endian width/|height| + biSizeImage;
  *  - PNG: 8-byte signature + IHDR big-endian width/height.
  *
  * Malformed input of any shape (truncated, bad magic, absurd sizes) is
  * kind='unknown' with null fields — NEVER a throw: at 100 TB a corrupt
  * asset must not kill the batch, it must land in the 'unknown' bucket a
  * pipeline can route on. One compiled O(header) pass per row inside
  * whole-stage codegen (GearChunks static-call pattern).
  */
case class MediaHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaHeader.outType
  override def prettyName: String = "media_header"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_header expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaHeader.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MediaHeader.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): MediaHeader =
    copy(child = newChild)
}

object MediaHeader {

  val outType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("data_bytes", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def be32(b: Array[Byte], o: Int): Long =
    (b(o + 3) & 0xffL) | ((b(o + 2) & 0xffL) << 8) |
      ((b(o + 1) & 0xffL) << 16) | ((b(o) & 0xffL) << 24)
  private def ascii4(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def unknown: GenericInternalRow = {
    val out = new Array[Any](8)
    out(0) = UTF8String.fromString("unknown")
    new GenericInternalRow(out)
  }

  def compute(bytes: Array[Byte]): GenericInternalRow = {
    val n = bytes.length
    // WAV: "RIFF" <size> "WAVE" then a chunk walk
    if (n >= 12 && ascii4(bytes, 0) == "RIFF" && ascii4(bytes, 8) == "WAVE") {
      var rate = -1; var ch = -1; var bits = -1; var byteRate = -1L
      var dataBytes = -1L
      var o = 12
      while (o + 8 <= n) {
        val id = ascii4(bytes, o)
        val sz = le32(bytes, o + 4)
        if (sz < 0 || sz > Int.MaxValue) return unknown
        if (id == "fmt " && o + 8 + 16 <= n && sz >= 16) {
          ch = le16(bytes, o + 10)
          rate = le32(bytes, o + 12).toInt
          byteRate = le32(bytes, o + 16)
          bits = le16(bytes, o + 22)
        } else if (id == "data") {
          // a data chunk may legally extend to EOF in streamed files;
          // clamp to what is actually present
          dataBytes = math.min(sz, (n - o - 8).toLong)
        }
        o += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks pad to even
      }
      if (rate <= 0 || ch <= 0 || dataBytes < 0) return unknown
      val out = new Array[Any](8)
      out(0) = UTF8String.fromString("wav")
      out(3) = rate; out(4) = ch
      if (bits > 0) out(5) = bits
      out(6) = dataBytes
      if (byteRate > 0) out(7) = dataBytes * 1000L / byteRate
      return new GenericInternalRow(out)
    }
    // BMP: "BM" file header (14 B) + BITMAPINFOHEADER (>= 40 B)
    if (n >= 54 && bytes(0) == 'B' && bytes(1) == 'M' && le32(bytes, 14) >= 40) {
      val w = le32(bytes, 18)
      val hRaw = le32(bytes, 22).toInt // negative = top-down, same pixels
      val h = math.abs(hRaw).toLong
      if (w <= 0 || w > Int.MaxValue || h <= 0 || h > Int.MaxValue)
        return unknown
      val out = new Array[Any](8)
      out(0) = UTF8String.fromString("bmp")
      out(1) = w.toInt; out(2) = h.toInt
      val sizeImage = le32(bytes, 34)
      if (sizeImage > 0) out(6) = sizeImage
      return new GenericInternalRow(out)
    }
    // PNG: 8-byte signature, first chunk must be IHDR (per spec)
    if (n >= 24 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && bytes(4) == 0x0d && bytes(5) == 0x0a &&
        bytes(6) == 0x1a && bytes(7) == 0x0a && ascii4(bytes, 12) == "IHDR") {
      val w = be32(bytes, 16)
      val h = be32(bytes, 20)
      if (w <= 0 || w > Int.MaxValue || h <= 0 || h > Int.MaxValue)
        return unknown
      val out = new Array[Any](8)
      out(0) = UTF8String.fromString("png")
      out(1) = w.toInt; out(2) = h.toInt
      return new GenericInternalRow(out)
    }
    unknown
  }

  // ------------------------------------------------------------- synthesis
  // Real writers for the same formats — the round-trip partner of the
  // parser (and the way the ORACLE query manufactures genuine media bytes
  // from table columns, so DuckDB can recompute every parsed field with
  // integer arithmetic).

  def synthWav(pcm: Array[Byte], rate: Int, channels: Int,
      bits: Int): Array[Byte] = {
    require(rate > 0 && channels > 0 && bits > 0 && bits % 8 == 0,
      s"synth_wav: invalid format rate=$rate channels=$channels bits=$bits")
    val pad = pcm.length & 1
    val byteRate = rate * channels * (bits / 8)
    val blockAlign = channels * (bits / 8)
    val buf = java.nio.ByteBuffer.allocate(44 + pcm.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(rate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(pcm.length).put(pcm)
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  def synthBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"synth_bmp: $width x $height")
    // 24bpp, rows padded to 4 bytes — headers only + zeroed pixel data
    val rowSize = (width * 3 + 3) / 4 * 4
    val sizeImage = rowSize.toLong * height
    require(sizeImage <= 8 * 1024 * 1024,
      s"synth_bmp: refusing > 8 MiB pixel buffer ($width x $height)")
    val total = 54 + sizeImage.toInt
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(total)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1.toShort)
      .putShort(24.toShort).putInt(0).putInt(sizeImage.toInt)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.array() // pixel area stays zeroed
  }

  def synthPng(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"synth_png: $width x $height")
    // signature + a CRC-correct IHDR chunk (8-bit truecolor); no IDAT —
    // the header is the contract here, and the parser reads only IHDR
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII")).putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(ihdr.array())
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + 17 + 4)
    buf.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    buf.putInt(13).put(ihdr.array()).putInt(crc.getValue.toInt)
    buf.array()
  }
}

/** `synth_wav(pcm)` with format config fixed at plan time (rate/channels/
  * bits are literals in the SQL call — they configure the writer, they are
  * not per-row data). */
case class SynthWav(child: Expression, rate: Int, channels: Int, bits: Int)
  extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synth_wav"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"synth_wav expects binary pcm, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    MediaHeader.synthWav(input.asInstanceOf[Array[Byte]], rate, channels, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MediaHeader.synthWav($b, $rate, $channels, $bits);")
  override protected def withNewChildInternal(newChild: Expression): SynthWav =
    copy(child = newChild)
}

/** `synth_bmp(width, height)` / `synth_png(width, height)` — per-row
  * dimensions, header-accurate output. */
case class SynthImage(left: Expression, right: Expression, png: Boolean)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (png) "synth_png" else "synth_bmp"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (int, int), got (${l.simpleString}, ${r.simpleString})")
    }
  override def nullSafeEval(w: Any, h: Any): Any =
    if (png) MediaHeader.synthPng(w.asInstanceOf[Int], h.asInstanceOf[Int])
    else MediaHeader.synthBmp(w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (png) "synthPng" else "synthBmp"
    nullSafeCodeGen(ctx, ev, (w, h) =>
      s"${ev.value} = graft.functions.MediaHeader.$fn($w, $h);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SynthImage = copy(left = newLeft, right = newRight)
}
