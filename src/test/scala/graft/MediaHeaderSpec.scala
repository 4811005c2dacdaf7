package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MediaHeader}

/** Real media-header decode contract: WAV/BMP/PNG round trips through the
  * matching writers, chunk-walk details (extra RIFF chunks, odd-size
  * padding, data-to-EOF clamp), BMP top-down negative height, and the
  * never-throw malformed envelope (truncated / bad magic / absurd
  * dims → kind='unknown', null fields).
  */
class MediaHeaderSpec extends SparkSpec {

  import spark.implicits._

  private def parse(bytes: Array[Byte]) = {
    GraftFunctions.register(spark)
    Seq(bytes).toDF("b").selectExpr("media_header(b) AS m")
      .select("m.kind", "m.width", "m.height", "m.sample_rate", "m.channels",
        "m.bits_per_sample", "m.data_bytes", "m.duration_ms")
      .head()
  }

  test("wav round trip: declared fmt fields, data size, duration") {
    val pcm = Array.tabulate(32001)(i => (i % 251).toByte) // odd → padded
    val r = parse(MediaHeader.synthWav(pcm, 16000, 1, 16))
    assert(r.getString(0) == "wav")
    assert(r.isNullAt(1) && r.isNullAt(2)) // no image dims
    assert(r.getInt(3) == 16000 && r.getInt(4) == 1 && r.getInt(5) == 16)
    assert(r.getLong(6) == 32001L)
    assert(r.getLong(7) == 32001L * 1000 / 32000) // declared byteRate
  }

  test("wav chunk walk: unknown chunks before fmt/data are skipped; " +
      "data-to-EOF clamps") {
    val pcm = Array.fill(100)(7.toByte)
    val base = MediaHeader.synthWav(pcm, 8000, 2, 16)
    // splice a LIST chunk (odd size → padded) between WAVE and fmt
    val list = java.nio.ByteBuffer.allocate(8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    list.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5, 0))
    val spliced = base.take(12) ++ list.array() ++ base.drop(12)
    val r = parse(spliced)
    assert(r.getString(0) == "wav" && r.getInt(3) == 8000 &&
      r.getInt(4) == 2 && r.getLong(6) == 100L)
    // truncated data chunk: declared 100 bytes, only 40 present
    val truncated = spliced.dropRight(60 + 0)
    val rt = parse(truncated)
    assert(rt.getString(0) == "wav" && rt.getLong(6) == 40L)
  }

  test("bmp round trip + top-down negative height") {
    val r = parse(MediaHeader.synthBmp(33, 21))
    assert(r.getString(0) == "bmp" && r.getInt(1) == 33 && r.getInt(2) == 21)
    assert(r.getLong(6) == ((33 * 3 + 3) / 4 * 4).toLong * 21)
    assert(r.isNullAt(3) && r.isNullAt(7))
    // flip the height field negative (top-down bitmap): same dimensions
    val b = MediaHeader.synthBmp(8, 4)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -4)
    val rn = parse(b)
    assert(rn.getString(0) == "bmp" && rn.getInt(1) == 8 && rn.getInt(2) == 4)
  }

  test("png round trip (CRC-correct IHDR)") {
    val bytes = MediaHeader.synthPng(640, 480)
    // the writer is honest: IHDR CRC verifies
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 12, 17)
    val stored = java.nio.ByteBuffer.wrap(bytes, 29, 4).getInt
    assert(stored == crc.getValue.toInt)
    val r = parse(bytes)
    assert(r.getString(0) == "png" && r.getInt(1) == 640 && r.getInt(2) == 480)
    assert(r.isNullAt(6))
  }

  test("jpeg round trip: SOF0 dims behind APP0; fill bytes and extra " +
      "segments are walked") {
    val r = parse(MediaHeader.synthJpeg(1280, 853))
    assert(r.getString(0) == "jpeg" && r.getInt(1) == 1280 && r.getInt(2) == 853)
    assert(r.getInt(4) == 3 && r.getInt(5) == 8) // components, precision
    assert(r.isNullAt(3) && r.isNullAt(6) && r.isNullAt(7))
    // splice a COM segment + a fill byte before SOF0 — real files carry
    // arbitrary APPn/COM runs; the walk must skip by declared length
    val base = MediaHeader.synthJpeg(64, 32)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 7) ++
      "hello".getBytes("US-ASCII")
    val fill = Array[Byte](0xff.toByte) // fill byte before the next marker
    val spliced = base.take(20) ++ com ++ fill ++ base.drop(20)
    val rs = parse(spliced)
    assert(rs.getString(0) == "jpeg" && rs.getInt(1) == 64 && rs.getInt(2) == 32)
    // progressive (SOF2) is a frame header too
    val prog = base.clone()
    prog(21) = 0xc2.toByte
    assert(parse(prog).getString(0) == "jpeg")
    // DHT (0xc4) is NOT a frame header: retagging SOF0 as DHT must not
    // parse dims from it — walk ends at EOI → unknown
    val dht = base.clone()
    dht(21) = 0xc4.toByte
    assert(parse(dht).getString(0) == "unknown")
  }

  test("flac round trip: STREAMINFO bit unpacking") {
    val r = parse(MediaHeader.synthFlac(441000L, 44100, 2, 16))
    assert(r.getString(0) == "flac")
    assert(r.getInt(3) == 44100 && r.getInt(4) == 2 && r.getInt(5) == 16)
    assert(r.getLong(7) == 10000L) // 441000 samples at 44100 Hz
    assert(r.isNullAt(1) && r.isNullAt(6))
    // odd field widths: 8 channels, 24-bit, non-round rate
    val r2 = parse(MediaHeader.synthFlac((1L << 35) + 17, 96001, 8, 24))
    assert(r2.getInt(3) == 96001 && r2.getInt(4) == 8 && r2.getInt(5) == 24)
    assert(r2.getLong(7) == ((1L << 35) + 17) * 1000L / 96001)
    // zero total samples (streamed FLAC): duration unknown, fields kept
    val r0 = parse(MediaHeader.synthFlac(0L, 8000, 1, 8))
    assert(r0.getString(0) == "flac" && r0.getInt(3) == 8000 && r0.isNullAt(7))
  }

  test("mp3: frame-header fields + CBR duration; ID3v2 tag is skipped") {
    val bytes = MediaHeader.synthMp3(160)
    val r = parse(bytes)
    assert(r.getString(0) == "mp3")
    assert(r.getInt(3) == 44100 && r.getInt(4) == 2)
    assert(r.getLong(6) == 160L * 417)
    assert(r.getLong(7) == 160L * 417 * 8000 / 128000)
    // prepend an ID3v2.3 tag (syncsafe size 300): same parse
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0,
      0, 0, (300 >> 7).toByte, (300 & 0x7f).toByte) ++ new Array[Byte](300)
    val rt = parse(id3 ++ bytes)
    assert(rt.getString(0) == "mp3" && rt.getInt(3) == 44100 &&
      rt.getLong(6) == 160L * 417)
    // mono MPEG-2 at 22050: flip version+mode bits by hand
    val f = MediaHeader.synthMp3(1)
    f(1) = 0xf3.toByte // MPEG2, Layer III
    f(3) = 0xc0.toByte // mono
    val rm = parse(f)
    assert(rm.getInt(3) == 22050 && rm.getInt(4) == 1)
    // free-format (bitrate idx 0) and reserved rate idx are rejected
    val free = MediaHeader.synthMp3(1); free(2) = 0x00
    assert(parse(free).getString(0) == "unknown")
    val badRate = MediaHeader.synthMp3(1); badRate(2) = 0x9c.toByte
    assert(parse(badRate).getString(0) == "unknown")
  }

  test("mp4: box walk to mvhd duration + tkhd 16.16 dims") {
    val r = parse(MediaHeader.synthMp4(1920, 1080, 90500L))
    assert(r.getString(0) == "mp4")
    assert(r.getInt(1) == 1920 && r.getInt(2) == 1080)
    assert(r.getLong(7) == 90500L) // timescale 1000
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(6))
    // audio-only shape: zero the tkhd dims — kind stays mp4, dims null
    val a = MediaHeader.synthMp4(4, 4, 777L)
    val bb = java.nio.ByteBuffer.wrap(a)
    bb.putInt(a.length - 8, 0).putInt(a.length - 4, 0)
    val ra = parse(a)
    assert(ra.getString(0) == "mp4" && ra.isNullAt(1) && ra.isNullAt(2) &&
      ra.getLong(7) == 777L)
    // truncated mid-moov: corrupt box sizes must land in unknown, not throw
    assert(parse(MediaHeader.synthMp4(4, 4, 1L).take(40)).getString(0)
      == "unknown")
  }

  test("malformed inputs land in kind='unknown', never throw") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "hello world, definitely not media".getBytes("UTF-8"),
      "RIFF".getBytes("US-ASCII"), // truncated before WAVE
      MediaHeader.synthWav(Array.fill(10)(1.toByte), 8000, 1, 16).take(20),
      MediaHeader.synthBmp(4, 4).take(30), // truncated below 54
      MediaHeader.synthPng(4, 4).take(15), // truncated before IHDR body
      { // PNG signature but zero width
        val p = MediaHeader.synthPng(1, 1)
        java.nio.ByteBuffer.wrap(p).putInt(16, 0); p
      },
      { // BMP with absurd negative width
        val b = MediaHeader.synthBmp(4, 4)
        java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(18, -7); b
      })
    cases.zipWithIndex.foreach { case (bytes, i) =>
      val r = parse(bytes)
      assert(r.getString(0) == "unknown", s"case $i: $r")
      (1 to 7).foreach(f => assert(r.isNullAt(f), s"case $i field $f: $r"))
    }
    // null payload → null struct (nullSafeEval)
    GraftFunctions.register(spark)
    val rn = Seq(Option.empty[Array[Byte]]).toDF("b")
      .selectExpr("media_header(b) AS m").head()
    assert(rn.isNullAt(0))
  }

  test("writers validate their config loudly") {
    intercept[IllegalArgumentException](
      MediaHeader.synthWav(Array.emptyByteArray, 0, 1, 16))
    intercept[IllegalArgumentException](MediaHeader.synthBmp(0, 5))
    intercept[IllegalArgumentException](MediaHeader.synthPng(5, -1))
    intercept[IllegalArgumentException](MediaHeader.synthBmp(10000, 10000))
  }
}
