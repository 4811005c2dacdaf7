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
            FROM documents""")),

    // -- resize planning (r5): aspect-preserving fit-to-224 geometry from
    // stub-decoded headers — all-integer arithmetic, so the whole plan
    // (not just counts) hash-checks against DuckDB ------------------------
    QueryDef("multimodal_resize_plan", (s, dir) => {
      val raw = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      MultimodalFunctions.resizePlan(s, raw, maxSide = 224)
    },
    Some("""WITH dims AS (SELECT doc_id,
                   100 + strlen(text) % 1000 AS src_w,
                   100 + (ascii(substr(text, 1, 1)) * 3) % 500 AS src_h
                 FROM documents)
            SELECT doc_id, CAST(src_w AS INT) AS src_w, CAST(src_h AS INT) AS src_h,
                   CAST(CASE WHEN src_w >= src_h THEN 224
                        ELSE greatest(1, (src_w * 224) // src_h) END AS INT) AS out_w,
                   CAST(CASE WHEN src_w >= src_h
                        THEN greatest(1, (src_h * 224) // src_w)
                        ELSE 224 END AS INT) AS out_h
            FROM dims""")),

    // -- audio framing (r5): the ASR front-end window count (25 ms windows,
    // 10 ms hop, 16 kHz, 16-bit samples) — exact integer arithmetic -------
    QueryDef("multimodal_audio_frames", (s, dir) => {
      val raw = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      MultimodalFunctions.audioFrames(s, raw)
    },
    Some("""SELECT doc_id,
             CAST(strlen(text) // 2 AS BIGINT) AS n_samples,
             CAST(CASE WHEN strlen(text) // 2 >= 400
                  THEN (strlen(text) // 2 - 400) // 160 + 1
                  ELSE 0 END AS BIGINT) AS n_frames
            FROM documents""")),

    // -- batched embedding (r5, the CLIP-encoder batch shape): per-row
    // integer feature norms oracle-check; batch composition is
    // partitioning-dependent and spec-checked instead (MultimodalSpec) ----
    QueryDef("multimodal_embed_batches", (s, dir) => {
      val raw = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      MultimodalFunctions.embedBatches(s, raw, batchSize = 32)
        .select(col("doc_id"), col("norm_sq"))
    },
    Some("""SELECT doc_id,
             CAST((strlen(text) % 97) * (strlen(text) % 97)
               + (ascii(substr(text, 1, 1)) % 31) * (ascii(substr(text, 1, 1)) % 31)
               + ((strlen(text) // 1000 + 1) % 13) * ((strlen(text) // 1000 + 1) % 13)
               + (strlen(text) % 7) * (strlen(text) % 7) AS BIGINT) AS norm_sq
            FROM documents""")),

    // -- REAL media-header decode (r9): WAV/BMP/PNG metadata is pure byte
    // arithmetic, so the stub contract is replaced by a genuine parser for
    // these formats ([[graft.functions.MediaHeader]] — RIFF chunk walk,
    // BITMAPINFOHEADER, IHDR). The query synthesizes header-accurate media
    // bytes per row (a third of each kind) with the matching REAL writers,
    // parses them back in the same codegen'd projection, and aggregates
    // the decoded fields — every one of which DuckDB recomputes with
    // integer arithmetic, so a single mis-parsed header fails the hash.
    // Scale shape: one compiled O(header) pass per row, zero shuffle
    // before the final rollup; corrupt assets land in kind='unknown'
    // instead of killing the batch (spec-pinned). ------------------------
    QueryDef("multimodal_real_headers", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("int").as("nc"),
          col("text").cast("binary").as("pcm"))
        .withColumn("w", (col("nc") % 61 + 1).cast("int"))
        .withColumn("h", (col("nc") % 47 + 1).cast("int"))
      val payload = when(col("doc_id") % 3 === 0,
          expr("synth_wav(pcm, 16000, 1, 16)"))
        .when(col("doc_id") % 3 === 1, expr("synth_bmp(w, h)"))
        .otherwise(expr("synth_png(w, h)"))
      docs.select(col("source"),
          call_function("media_header", payload).as("m"))
        .groupBy(col("source"), col("m.kind").as("kind"))
        .agg(count(lit(1)).as("assets"),
          sum(coalesce(col("m.width"), lit(0))).cast("long").as("sum_w"),
          sum(coalesce(col("m.height"), lit(0))).cast("long").as("sum_h"),
          sum(coalesce(col("m.data_bytes"), lit(0L))).as("sum_data_bytes"),
          sum(coalesce(col("m.duration_ms"), lit(0L))).as("sum_duration_ms"))
    },
    Some("""WITH x AS (SELECT source,
                   CASE CAST(doc_id % 3 AS INT)
                     WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp' ELSE 'png' END AS kind,
                   CAST(n_chars % 61 + 1 AS BIGINT) AS w,
                   CAST(n_chars % 47 + 1 AS BIGINT) AS h,
                   CAST(strlen(text) AS BIGINT) AS len
                 FROM documents)
            SELECT source, kind, count(*) AS assets,
              CAST(sum(CASE WHEN kind IN ('bmp','png') THEN w ELSE 0 END)
                AS BIGINT) AS sum_w,
              CAST(sum(CASE WHEN kind IN ('bmp','png') THEN h ELSE 0 END)
                AS BIGINT) AS sum_h,
              CAST(sum(CASE WHEN kind = 'wav' THEN len
                       WHEN kind = 'bmp' THEN ((w * 3 + 3) // 4 * 4) * h
                       ELSE 0 END) AS BIGINT) AS sum_data_bytes,
              CAST(sum(CASE WHEN kind = 'wav' THEN len * 1000 // 32000
                       ELSE 0 END) AS BIGINT) AS sum_duration_ms
            FROM x GROUP BY 1, 2""")),

    // -- REAL codec-free header decode, wave 2 (r10): JPEG (SOI + marker
    // walk to the SOF frame header), FLAC (STREAMINFO bit unpacking),
    // MP3 (ID3v2-skip + MPEG-1 Layer III frame header, CBR duration) and
    // MP4/ISO-BMFF (box walk → mvhd duration, tkhd 16.16 dims) are
    // also pure byte arithmetic — so the "codec-dependent" stub boundary
    // retreats to PIXEL/AUDIO-DATA decoding only. Same contract as wave 1:
    // synthesize
    // header-accurate bytes per row with the REAL writers, parse them back
    // in one codegen'd projection, aggregate every decoded field, and let
    // DuckDB recompute each with integer arithmetic (jpeg: the SOF dims +
    // 3 components @ 8 bits; flac: samples·1000/rate; mp3: frames·417
    // bytes and the 128 kbps CBR duration). Malformed input stays
    // kind='unknown', spec-pinned in MediaHeaderSpec. ---------------------
    QueryDef("multimodal_codec_headers", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("int").as("nc"))
        .withColumn("w", (col("nc") % 61 + 1).cast("int"))
        .withColumn("h", (col("nc") % 47 + 1).cast("int"))
        .withColumn("frames", (col("nc") % 200 + 1).cast("int"))
        .withColumn("samples", col("nc").cast("long") * 100 + 1)
        .withColumn("dur", col("nc").cast("long") * 10 + 5)
      val payload = when(col("doc_id") % 4 === 0, expr("synth_mp3(frames)"))
        .when(col("doc_id") % 4 === 1, expr("synth_jpeg(w, h)"))
        .when(col("doc_id") % 4 === 2, expr("synth_mp4(w, h, dur)"))
        .otherwise(expr("synth_flac(samples, 16000, 2, 16)"))
      docs.select(col("source"),
          call_function("media_header", payload).as("m"))
        .groupBy(col("source"), col("m.kind").as("kind"))
        .agg(count(lit(1)).as("assets"),
          sum(coalesce(col("m.width"), lit(0))).cast("long").as("sum_w"),
          sum(coalesce(col("m.height"), lit(0))).cast("long").as("sum_h"),
          sum(coalesce(col("m.channels"), lit(0))).cast("long")
            .as("sum_channels"),
          sum(coalesce(col("m.bits_per_sample"), lit(0))).cast("long")
            .as("sum_bits"),
          sum(coalesce(col("m.data_bytes"), lit(0L))).as("sum_data_bytes"),
          sum(coalesce(col("m.duration_ms"), lit(0L))).as("sum_duration_ms"))
    },
    Some("""WITH x AS (SELECT source,
                   CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN 'mp3' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'mp4'
                     ELSE 'flac' END AS kind,
                   CAST(n_chars % 61 + 1 AS BIGINT) AS w,
                   CAST(n_chars % 47 + 1 AS BIGINT) AS h,
                   CAST(n_chars % 200 + 1 AS BIGINT) AS frames,
                   CAST(n_chars * 100 + 1 AS BIGINT) AS samples,
                   CAST(n_chars * 10 + 5 AS BIGINT) AS dur
                 FROM documents)
            SELECT source, kind, count(*) AS assets,
              CAST(sum(CASE WHEN kind IN ('jpeg', 'mp4') THEN w ELSE 0 END)
                AS BIGINT) AS sum_w,
              CAST(sum(CASE WHEN kind IN ('jpeg', 'mp4') THEN h ELSE 0 END)
                AS BIGINT) AS sum_h,
              CAST(sum(CASE kind WHEN 'jpeg' THEN 3 WHEN 'mp4' THEN 0
                ELSE 2 END) AS BIGINT) AS sum_channels,
              CAST(sum(CASE kind WHEN 'jpeg' THEN 8 WHEN 'flac' THEN 16
                ELSE 0 END) AS BIGINT) AS sum_bits,
              CAST(sum(CASE WHEN kind = 'mp3' THEN frames * 417 ELSE 0 END)
                AS BIGINT) AS sum_data_bytes,
              CAST(sum(CASE kind WHEN 'mp3' THEN frames * 417 * 8000 // 128000
                WHEN 'flac' THEN samples * 1000 // 16000
                WHEN 'mp4' THEN dur
                ELSE 0 END) AS BIGINT) AS sum_duration_ms
            FROM x GROUP BY 1, 2"""))
  )
}
