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
