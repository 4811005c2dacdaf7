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

  case class ResizePlan(doc_id: Long, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int)

  /** Resize planning: stub-decode source dimensions from the payload
    * (deterministic arithmetic on byte length / first byte — a real decoder
    * reads the image header here), then compute the aspect-preserving
    * fit-in-`maxSide` target with INTEGER arithmetic (floor division, min
    * side 1) so the plan is bit-checkable across engines. The resize
    * KERNEL itself would run in the same partition-wise loop on the
    * payload; only its geometry is computed here.
    */
  def resizePlan(spark: SparkSession, df: DataFrame, maxSide: Int): DataFrame = {
    import spark.implicits._
    df.as[FrameRef].mapPartitions { it =>
      it.map { a =>
        val (n, first, _) = stubDecode(a.payload)
        val w = 100 + n % 1000          // stub header: source width
        val h = 100 + (first * 3) % 500 // stub header: source height
        val (ow, oh) =
          if (w >= h) (maxSide, math.max(1, h * maxSide / w))
          else (math.max(1, w * maxSide / h), maxSide)
        ResizePlan(a.doc_id, w, h, ow, oh)
      }
    }.toDF()
  }

  case class AudioFrames(doc_id: Long, n_samples: Long, n_frames: Long)

  /** Audio framing: 16-bit samples (stub: n_bytes/2), 25 ms windows at a
    * 10 ms hop at 16 kHz — frames = (samples − 400)/160 + 1 when at least
    * one full window fits, else 0. The standard ASR/feature-extraction
    * front-end shape; a real implementation emits the window tensors from
    * the same partition-wise loop.
    */
  def audioFrames(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.as[FrameRef].mapPartitions { it =>
      it.map { a =>
        val samples = a.payload.length.toLong / 2
        val frames = if (samples >= 400) (samples - 400) / 160 + 1 else 0L
        AudioFrames(a.doc_id, samples, frames)
      }
    }.toDF()
  }

  case class EmbeddedAsset(doc_id: Long, batch_size: Int, norm_sq: Long)

  /** Batched embedding extraction (the CLIP-encoder shape): rows are
    * buffered into fixed-size batches INSIDE the partition loop — a real
    * encoder runs one forward pass per batch (model state initialized once
    * per partition, never serialized) — and each row leaves with its
    * embedding plus the size of the batch it rode in. The stub "embedding"
    * is four integer features of the bytes; `norm_sq` (their exact integer
    * squared norm) is the oracle-checkable projection of it. Batch
    * COMPOSITION depends on partitioning (spec-checked: sizes ≤ batchSize,
    * row multiset preserved); per-row features do not.
    */
  def embedBatches(spark: SparkSession, df: DataFrame, batchSize: Int): DataFrame = {
    import spark.implicits._
    require(batchSize > 0, "embedBatches needs a positive batchSize")
    df.as[FrameRef].mapPartitions { it =>
      // per-partition encoder init would go here
      it.grouped(batchSize).flatMap { batch =>
        // one "forward pass" over the whole batch
        batch.map { a =>
          val (n, first, frames) = stubDecode(a.payload)
          val f = Array[Long](n % 97, first % 31, frames % 13, n % 7)
          EmbeddedAsset(a.doc_id, batch.size, f.map(x => x * x).sum)
        }
      }
    }.toDF()
  }
}
