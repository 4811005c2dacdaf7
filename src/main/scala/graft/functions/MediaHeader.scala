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
  *  - PNG: 8-byte signature + IHDR big-endian width/height;
  *  - JPEG (r10): SOI + marker-segment walk to the first frame header
  *    (SOF0–SOF15 minus DHT/JPG/DAC, the JFIF rule) → width, height,
  *    channels (component count), bits_per_sample (sample precision);
  *    APPn/COM/DQT segments are skipped by their declared big-endian
  *    lengths, standalone markers (TEM, RSTn) by fiat;
  *  - FLAC (r10): 'fLaC' magic + the mandatory first STREAMINFO block →
  *    sample_rate (20 bits), channels (3 bits + 1), bits_per_sample
  *    (5 bits + 1), total samples (36 bits) → duration_ms;
  *  - MP3 (r10): optional ID3v2 tag skip (syncsafe size), then the first
  *    valid MPEG-1/2/2.5 Layer III frame header → sample_rate, channels
  *    (mono vs the three 2-channel modes), data_bytes (audio region after
  *    the tag) and CBR duration_ms = data_bytes·8000/bitrate — the
  *    estimate every header-only tagger ships; VBR files get the
  *    first-frame-rate estimate, exactly like those taggers;
  *  - MP4/ISO-BMFF (r10): box walk (ftyp sniff, size-0 = to-EOF, size-1 =
  *    64-bit largesize) → moov/mvhd timescale+duration (v0 and v1) →
  *    duration_ms, and the first moov/trak/tkhd's 16.16 fixed-point
  *    width/height (the video-track dims; audio tracks carry 0×0 and are
  *    skipped). Entropy-coded sample data never needs decoding for any of
  *    this — it is the moov metadata tree, plain big-endian arithmetic.
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
    // JPEG: SOI then a marker walk to the first SOFn frame header
    if (n >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var o = 2
      while (o + 4 <= n) {
        if ((bytes(o) & 0xff) != 0xff) return unknown // lost marker sync
        var m = bytes(o + 1) & 0xff
        // fill bytes: a marker may be preceded by any number of 0xff
        while (m == 0xff && o + 2 < n) { o += 1; m = bytes(o + 1) & 0xff }
        if (m == 0xd9 || m == 0xda) return unknown // EOI/SOS before any SOF
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { o += 2 } // standalone
        else {
          if (o + 4 > n) return unknown
          val segLen = be16(bytes, o + 2)
          if (segLen < 2 || o + 2 + segLen > n) return unknown
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc // DHT/JPG/DAC are not SOF
          if (isSof) {
            if (segLen < 8) return unknown
            val precision = bytes(o + 4) & 0xff
            val h = be16(bytes, o + 5)
            val w = be16(bytes, o + 7)
            val ncomp = bytes(o + 9) & 0xff
            if (w <= 0 || h <= 0 || ncomp <= 0) return unknown
            val out = new Array[Any](8)
            out(0) = UTF8String.fromString("jpeg")
            out(1) = w; out(2) = h
            out(4) = ncomp
            out(5) = precision
            return new GenericInternalRow(out)
          }
          o += 2 + segLen
        }
      }
      return unknown
    }
    // FLAC: 'fLaC' + mandatory first STREAMINFO metadata block (type 0,
    // 34 bytes): 16+16 blocksize, 24+24 framesize, then a 64-bit packed
    // field = rate(20) | channels-1(3) | bits-1(5) | totalSamples(36)
    if (n >= 4 + 4 + 34 && bytes(0) == 'f' && bytes(1) == 'L' &&
        bytes(2) == 'a' && bytes(3) == 'C' && (bytes(4) & 0x7f) == 0 &&
        be24(bytes, 5) == 34) {
      val o = 8 + 10 // skip block header + blocksize/framesize fields
      val hi = be32(bytes, o) // rate(20) | ch(3) | bits(5 high 4)
      val lo = be32(bytes, o + 4) // bits(low 1) | totalSamples(high 32)...
      val rate = (hi >>> 12).toInt
      val ch = ((hi >>> 9) & 0x7).toInt + 1
      val bits = (((hi >>> 4) & 0x1f).toInt) + 1
      val samples = ((hi & 0xfL) << 32) | lo
      if (rate <= 0) return unknown
      val out = new Array[Any](8)
      out(0) = UTF8String.fromString("flac")
      out(3) = rate; out(4) = ch; out(5) = bits
      if (samples > 0) out(7) = samples * 1000L / rate
      return new GenericInternalRow(out)
    }
    // MP4 / ISO-BMFF: 'ftyp' first box (the standard sniff), then a box
    // walk to moov/mvhd (timescale+duration) and moov/trak/tkhd (the first
    // track with nonzero 16.16 fixed-point dims = the video track)
    if (n >= 12 && ascii4(bytes, 4) == "ftyp") {
      // returns (payloadStart, payloadEnd, nextBoxStart) or null on corrupt
      def box(o: Int, end: Int): (String, Int, Int, Int) = {
        if (o + 8 > end) return null
        val sz = be32(bytes, o)
        val tpe = ascii4(bytes, o + 4)
        if (sz == 1L) { // 64-bit largesize
          if (o + 16 > end) return null
          val big = (be32(bytes, o + 8) << 32) | be32(bytes, o + 12)
          if (big < 16 || o + big > end) return null
          (tpe, o + 16, o + big.toInt, o + big.toInt)
        } else if (sz == 0L) (tpe, o + 8, end, end) // to end of file
        else {
          if (sz < 8 || o + sz > end) return null
          (tpe, o + 8, (o + sz).toInt, (o + sz).toInt)
        }
      }
      var tscale = -1L; var dur = -1L; var w = -1; var h = -1
      var o = 0
      var guard = 0
      while (o + 8 <= n && guard < 10000) {
        guard += 1
        val b = box(o, n)
        if (b == null) return unknown
        val (tpe, ps, pe, nxt) = b
        if (tpe == "moov") {
          var mo = ps
          while (mo + 8 <= pe && guard < 10000) {
            guard += 1
            val mb = box(mo, pe)
            if (mb == null) return unknown
            val (mt, mps, mpe, mnxt) = mb
            if (mt == "mvhd" && mpe - mps >= 20) {
              val v = bytes(mps) & 0xff
              if (v == 1 && mpe - mps >= 4 + 16 + 12) {
                tscale = be32(bytes, mps + 20)
                dur = (be32(bytes, mps + 24) << 32) | be32(bytes, mps + 28)
              } else if (v == 0) {
                tscale = be32(bytes, mps + 12)
                dur = be32(bytes, mps + 16)
              }
            } else if (mt == "trak" && (w <= 0 || h <= 0)) {
              var to = mps
              while (to + 8 <= mpe && guard < 10000) {
                guard += 1
                val tb = box(to, mpe)
                if (tb == null) return unknown
                val (tt, tps, tpe2, tnxt) = tb
                if (tt == "tkhd") {
                  val v = bytes(tps) & 0xff
                  val wOff = if (v == 1) 88 else 76
                  if (tpe2 - tps >= wOff + 8) {
                    val wf = be32(bytes, tps + wOff)
                    val hf = be32(bytes, tps + wOff + 4)
                    if (wf > 0 && hf > 0) { // 16.16 fixed point
                      w = (wf >>> 16).toInt; h = (hf >>> 16).toInt
                    }
                  }
                }
                to = tnxt
              }
            }
            mo = mnxt
          }
        }
        o = nxt
      }
      if (tscale <= 0) return unknown
      val out = new Array[Any](8)
      out(0) = UTF8String.fromString("mp4")
      if (w > 0 && h > 0) { out(1) = w; out(2) = h }
      if (dur >= 0) out(7) = dur * 1000L / tscale
      return new GenericInternalRow(out)
    }
    // MP3: skip an ID3v2 tag if present (10-byte header, syncsafe size),
    // then require a valid MPEG audio Layer III frame header
    {
      var o = 0
      if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        o = 10 + sz
      }
      if (o + 4 <= n && (bytes(o) & 0xff) == 0xff &&
          (bytes(o + 1) & 0xe0) == 0xe0) {
        val b1 = bytes(o + 1) & 0xff
        val b2 = bytes(o + 2) & 0xff
        val b3 = bytes(o + 3) & 0xff
        val versionBits = (b1 >>> 3) & 0x3 // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (b1 >>> 1) & 0x3 // 1 = Layer III
        val bitrateIdx = (b2 >>> 4) & 0xf
        val rateIdx = (b2 >>> 2) & 0x3
        if (versionBits != 1 && layerBits == 1 && bitrateIdx != 0 &&
            bitrateIdx != 15 && rateIdx != 3) {
          val mpeg1 = versionBits == 3
          // Layer III bitrates (kbps); MPEG2/2.5 share the low table
          val kbps =
            if (mpeg1) mp3BitrateV1(bitrateIdx) else mp3BitrateV2(bitrateIdx)
          val baseRate = mp3RateV1(rateIdx)
          val rate = versionBits match {
            case 3 => baseRate
            case 2 => baseRate / 2
            case _ => baseRate / 4
          }
          val ch = if (((b3 >>> 6) & 0x3) == 3) 1 else 2
          val audioBytes = (n - o).toLong
          val out = new Array[Any](8)
          out(0) = UTF8String.fromString("mp3")
          out(3) = rate; out(4) = ch
          out(6) = audioBytes
          // CBR estimate off the first frame header — what header-only
          // taggers report; exact for the synth writer's identical frames
          out(7) = audioBytes * 8000L / (kbps * 1000L)
          return new GenericInternalRow(out)
        }
      }
    }
    unknown
  }

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be24(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
  private val mp3BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320, 0)
  private val mp3BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56,
    64, 80, 96, 112, 128, 144, 160, 0)
  private val mp3RateV1 = Array(44100, 48000, 32000, 0)

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

  /** Header-accurate baseline JPEG: SOI + JFIF APP0 + an SOF0 frame header
    * (8-bit, 3 components, 1×1 sampling) + EOI. No entropy-coded data —
    * the frame header is the contract, and the parser stops at SOF. */
  def synthJpeg(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"synth_jpeg: $width x $height out of the 16-bit SOF range")
    val buf = java.nio.ByteBuffer.allocate(2 + 18 + 19 + 2) // SOI APP0 SOF0 EOI
    buf.putShort(0xffd8.toShort) // SOI
    buf.putShort(0xffe0.toShort).putShort(16.toShort) // APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte) // version 1.1
      .put(0.toByte).putShort(1.toShort).putShort(1.toShort) // aspect 1:1
      .put(0.toByte).put(0.toByte) // no thumbnail
    buf.putShort(0xffc0.toShort).putShort(17.toShort) // SOF0, len 17 (3 comp)
      .put(8.toByte) // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(3.toByte) // components
    var c = 1
    while (c <= 3) { // id, 1x1 sampling, quant table 0
      buf.put(c.toByte).put(0x11.toByte).put(0.toByte); c += 1
    }
    buf.putShort(0xffd9.toShort) // EOI
    buf.array()
  }

  /** 'fLaC' + a last-block STREAMINFO (34 bytes) — the full mandatory
    * metadata header of a real FLAC file, zero audio frames. */
  def synthFlac(totalSamples: Long, rate: Int, channels: Int,
      bits: Int): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20) && channels >= 1 && channels <= 8 &&
      bits >= 4 && bits <= 32 && totalSamples >= 0 && totalSamples < (1L << 36),
      s"synth_flac: invalid samples=$totalSamples rate=$rate " +
        s"channels=$channels bits=$bits")
    val buf = java.nio.ByteBuffer.allocate(4 + 4 + 34)
    buf.put("fLaC".getBytes("US-ASCII"))
    buf.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    buf.putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // min framesize unknown
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // max framesize unknown
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | totalSamples
    buf.putLong(packed)
    // 16-byte MD5 stays zeroed (unset, legal)
    buf.array()
  }

  /** N identical MPEG-1 Layer III frames at 128 kbps / 44100 Hz / stereo
    * (frame size ⌊144·128000/44100⌋ = 417 B), zeroed payloads — a real
    * CBR stream shape whose header fields and duration the parser (and
    * DuckDB) recompute exactly: duration_ms = frames·417·8000/128000. */
  def synthMp3(frames: Int): Array[Byte] = {
    require(frames > 0 && frames <= 100000, s"synth_mp3: frames=$frames")
    val frameSize = 144 * 128000 / 44100 // 417
    val b = new Array[Byte](frames * frameSize)
    var i = 0
    while (i < frames) {
      val o = i * frameSize
      b(o) = 0xff.toByte; b(o + 1) = 0xfb.toByte // MPEG1 L3 no-CRC
      b(o + 2) = 0x90.toByte // bitrate idx 9 (128k), 44100, no padding
      b(o + 3) = 0x00 // stereo
      i += 1
    }
    b
  }

  /** Minimal real ISO-BMFF: ftyp + moov(mvhd v0 @ timescale 1000 + one
    * trak(tkhd) with 16.16 fixed-point dims). No mdat — the metadata tree
    * is the contract, exactly what the parser (and any real demuxer's
    * header probe) reads. */
  def synthMp4(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff &&
      durationMs >= 0 && durationMs < (1L << 32),
      s"synth_mp4: invalid $width x $height durationMs=$durationMs")
    val buf = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 100)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    buf.putInt(8 + 108 + 100).put("moov".getBytes("US-ASCII"))
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(1000) // timescale: ms
      .putInt(durationMs.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
      .putLong(0) // reserved
    buf.putInt(0x00010000).putInt(0).putInt(0) // identity matrix rows
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(2) // next_track_ID
    buf.putInt(100).put("trak".getBytes("US-ASCII"))
    buf.putInt(92).put("tkhd".getBytes("US-ASCII"))
      .putInt(0x000007) // version 0, flags: enabled|in-movie|in-preview
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(1).putInt(0) // track ID, reserved
      .putInt(durationMs.toInt)
      .putLong(0) // reserved
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/vol/rsvd
    buf.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    buf.putInt(width << 16).putInt(height << 16) // 16.16 fixed
    buf.array()
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

/** `synth_flac(samples)` with rate/channels/bits fixed at plan time —
  * the [[SynthWav]] pattern: format config is a literal, samples per-row. */
case class SynthFlac(child: Expression, rate: Int, channels: Int, bits: Int)
  extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synth_flac"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"synth_flac expects bigint total samples, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    MediaHeader.synthFlac(input.asInstanceOf[Long], rate, channels, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MediaHeader.synthFlac($s, $rate, $channels, $bits);")
  override protected def withNewChildInternal(newChild: Expression): SynthFlac =
    copy(child = newChild)
}

/** `synth_mp3(frames)` — N-frame CBR MPEG-1 Layer III stream. */
case class SynthMp3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synth_mp3"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"synth_mp3 expects int frame count, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    MediaHeader.synthMp3(input.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f =>
      s"${ev.value} = graft.functions.MediaHeader.synthMp3($f);")
  override protected def withNewChildInternal(newChild: Expression): SynthMp3 =
    copy(child = newChild)
}

/** `synth_mp4(width, height, duration_ms)` — real ISO-BMFF metadata tree
  * (ftyp + moov/mvhd/trak/tkhd) at timescale 1000. */
case class SynthMp4(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synth_mp4"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, m, r) => TypeCheckResult.TypeCheckFailure(
        s"synth_mp4 expects (int, int, bigint), got " +
          s"(${l.simpleString}, ${m.simpleString}, ${r.simpleString})")
    }
  override def nullSafeEval(w: Any, h: Any, d: Any): Any =
    MediaHeader.synthMp4(w.asInstanceOf[Int], h.asInstanceOf[Int],
      d.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, d) =>
      s"${ev.value} = graft.functions.MediaHeader.synthMp4($w, $h, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SynthMp4 = copy(first = f, second = s, third = t)
}

/** `synth_bmp(width, height)` / `synth_png(width, height)` /
  * `synth_jpeg(width, height)` — per-row dimensions, header-accurate
  * output. `kind` ∈ bmp|png|jpeg. */
case class SynthImage(left: Expression, right: Expression, kind: String)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"synth_$kind"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (int, int), got (${l.simpleString}, ${r.simpleString})")
    }
  private def fn: String = kind match {
    case "png" => "synthPng"
    case "jpeg" => "synthJpeg"
    case _ => "synthBmp"
  }
  override def nullSafeEval(w: Any, h: Any): Any = kind match {
    case "png" => MediaHeader.synthPng(w.asInstanceOf[Int], h.asInstanceOf[Int])
    case "jpeg" => MediaHeader.synthJpeg(w.asInstanceOf[Int], h.asInstanceOf[Int])
    case _ => MediaHeader.synthBmp(w.asInstanceOf[Int], h.asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h) =>
      s"${ev.value} = graft.functions.MediaHeader.$fn($w, $h);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SynthImage = copy(left = newLeft, right = newRight)
}
