package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.MultimodalFunctions

/** [EXT] Multimodal-column plumbing (SURVEY builder prompt): opaque `binary`
  * payloads + typed metadata, with decode/feature-extraction as partition-wise
  * typed transforms. No real image/audio codecs exist in this environment, so
  * the decode step is a clearly-marked deterministic stub
  * ([[MultimodalFunctions.stubDecode]]) — the Spark-side contract (schema,
  * batch shape, partition-wise execution, metadata passthrough) is real and
  * oracle-checked.
  */
object MultimodalQueries {

  val all: Seq[QueryDef] = Seq(

    // -- binary ingestion + partition-wise feature extraction ---------------
    QueryDef("multimodal_features", (s, dir) => {
      // documents.text stands in for the opaque payload: cast to binary,
      // run the partition-wise "decoder", keep typed metadata alongside
      val raw = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          col("text").cast("binary").as("payload"))
      MultimodalFunctions.extractFeatures(s, raw)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("assets"),
          sum(col("n_bytes")).cast("long").as("total_bytes"),
          sum(col("frame_count")).cast("long").as("total_frames"),
          min(col("first_byte")).as("min_first_byte"))
    },
    Some("""SELECT source, count(*) AS assets,
             CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
             CAST(sum(strlen(text) // 1000 + 1) AS BIGINT) AS total_frames,
             CAST(min(ascii(substr(text, 1, 1))) AS INT) AS min_first_byte
            FROM documents GROUP BY 1""")),

    // -- frame sampling: every k-th synthetic frame. The stub's frame count
    // is arithmetic on byte length, so the flatMap-shaped decode IS
    // oracle-checkable: every-4th of (len/1000 + 1) frames = len/1000/4 + 1
    QueryDef("multimodal_frame_sample", (s, dir) => {
      val raw = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      MultimodalFunctions.sampleFrames(s, raw, everyK = 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("sampled_frames"))
    },
    Some("""SELECT doc_id,
             CAST((strlen(text) // 1000) // 4 + 1 AS BIGINT) AS sampled_frames
            FROM documents"""))
  )
}
