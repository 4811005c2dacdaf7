package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Multimodal decode/feature plumbing. The real-world shape: an opaque
  * `binary` column (image/audio/video bytes) plus typed metadata, decoded
  * partition-wise so codec state is initialized once per partition (the Scala
  * analog of a Pandas-UDF-over-`mapInPandas` batch loop).
  *
  * ⚠ STUB DECODER: no media codecs exist in this container, so
  * [[stubDecode]] derives deterministic pseudo-features from the raw bytes.
  * Swap `stubDecode` for a real codec (JNI/javacv/etc.) — everything else
  * (schema, typed Dataset flow, per-partition init, downstream aggregation)
  * is production-shaped.
  */
object MultimodalFunctions {

  case class Asset(doc_id: Long, source: String, payload: Array[Byte])
  case class AssetFeatures(doc_id: Long, source: String, n_bytes: Int,
      first_byte: Int, frame_count: Int)
  case class FrameRef(doc_id: Long, payload: Array[Byte])
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int)

  /** Deterministic fake "decode": byte length, first byte, synthetic frame
    * count (1 frame per KiB-ish block). A real decoder returns
    * width/height/duration/frames here.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else -1
    val frames = n / 1000 + 1
    (n, first, frames)
  }

  /** Partition-wise feature extraction over (doc_id, source, payload). */
  def extractFeatures(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.as[Asset].mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts are not
      // serializable — this is why the loop is partition-wise, not per-row)
      it.map { a =>
        val (n, first, frames) = stubDecode(a.payload)
        AssetFeatures(a.doc_id, a.source, n, first, frames)
      }
    }.toDF()
  }

  /** Frame sampling: emit every k-th synthetic frame per asset (the
    * flatMap-shaped decode: one input row → many output rows).
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, everyK: Int): DataFrame = {
    import spark.implicits._
    df.as[FrameRef].mapPartitions { it =>
      it.flatMap { a =>
        val (_, _, frames) = stubDecode(a.payload)
        (0 until frames by everyK).map { i =>
          val start = i * 1000
          val len = math.min(1000, a.payload.length - start).max(0)
          Frame(a.doc_id, i, len)
        }
      }
    }.toDF()
  }
}
