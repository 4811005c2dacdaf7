package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MinHash}
import graft.queries.Tables
import graft.streaming.StreamDedup

/** Measured evidence for [[graft.streaming.StreamDedup]] on the real
  * documents corpus: (a) throughput through the streaming path, staged as
  * id-ordered files and fed one file per micro-batch; (b) a single-batch
  * run cross-checked for EQUALITY against the relational batch predicate
  * (band-collide AND signature-similarity ≥ t AND id_a < id_b → drop
  * id_b) — the same check StreamDedupSpec's driver model does at toy
  * scale, here at corpus scale. The multi-batch run stages files with
  * ascending mtimes in id-range order so arrival is ascending docId —
  * without that, FileStreamSource's tie-broken pickup order reordered
  * files and keep-first legitimately kept BOTH sides of cross-file pairs
  * (measured: 494 vs 476 survivors at sf0.01 — the ordering contract is
  * real, not theoretical).
  *
  * Prints ONE JSON line. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.StreamDedupProbe"
  */
object StreamDedupProbe {
  private val K = 32
  private val Bands = 8
  private val W = 3
  private val T = 0.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val files = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "8").toInt
    // SPARK_GRAFT_STATE_STORE=rocksdb measures the cluster-realistic state
    // backend (incremental changelog per batch instead of HDFSBackedStateStore
    // rewriting full in-memory maps to snapshot files) — the backend the
    // StreamDedup scaladoc says a 100 TB continual-ingest dedup runs on;
    // resolution + validation shared with the other probe in StateStoreEnv
    // SPARK_GRAFT_STATE_PARTS sizes the stateful operator's partition
    // count (spark.sql.shuffle.partitions at query start binds the state
    // layout): every state partition is a full RocksDB instance whose
    // commit (memtable flush + checkpoint + changelog/snapshot sync) is
    // per-batch machinery INDEPENDENT of row deltas — 32 instances on one
    // box serialize on disk sync. On a cluster, size this to the executor
    // count you actually have, not to a parallelism ideal: the map side
    // (scan + signatures) parallelizes by INPUT splits regardless.
    val stateParts = sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", stateParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // micro-batch scan parallelism, part 1 (r10): small split size so a
      // multi-row-group file fans out. NOT sufficient alone — a parquet
      // ROW GROUP is read by the one split containing its midpoint, and a
      // 62.5k-doc staged file is a single ~50 MB row group at the 128 MB
      // writer default, so byte-range splits cannot parallelize it; the
      // staging below (part 2) therefore writes MANY FILES PER TRIGGER.
      // Measured at ×100/rocksdb: 1-file triggers ran the whole map side
      // (parquet read + shingles + 32-hash MinHash signatures) on ONE core
      // per batch — multi-batch 169.8 s vs single-batch 25.1 s for
      // identical total work, the gap tracking batch count, not state size
      // (4-file staging: 184.8 s / 46.4 s), and byte-range splits alone
      // moved nothing (209–232 s) because of the row-group midpoint rule.
      .config("spark.sql.files.maxPartitionBytes", 4 * 1024 * 1024)
    val stateStore = StateStoreEnv(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    // SPARK_GRAFT_PROBE_SCALE=N replicates the corpus ×N with remapped ids
    // and IDENTICAL bodies — the adversarial worst case for bucket state
    // (every clone lands in every one of its original's buckets), and
    // self-validating: ids order originals-first, every clone is an exact
    // dup of its original, so survivors at ×N must EQUAL survivors at ×1
    val scale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "1").toInt
    val base = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val docs =
      if (scale <= 1) base
      else base.crossJoin(spark.range(scale).withColumnRenamed("id", "__copy"))
        .withColumn("doc_id", col("doc_id") + col("__copy") * 10000000L)
        .drop("__copy")
    val total = docs.count()
    val root = java.nio.file.Files.createTempDirectory("graft-sdprobe").toString

    // micro-batch scan parallelism, part 2 (r10): stage `perTrigger` files
    // per micro-batch (id-range-ordered ACROSS the whole file sequence, so
    // "oldest perTrigger files" is still an ascending id block) — the
    // file-source analog of a Kafka topic's partitions, which hand every
    // trigger as many splits as the topic has partitions. One file per
    // trigger serializes the map side on a single core (see the
    // maxPartitionBytes note above for the measured cost).
    val perTrigger = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES_PER_TRIGGER",
      "8").toInt
    docs.repartitionByRange(files * perTrigger, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$root/staged")
    // FileStreamSource orders pickup by modification time, and a parallel
    // write gives every part file the same second — stamp ascending mtimes
    // in id-range order so multi-batch arrival IS ascending docId (and the
    // stream result becomes comparable to the relational twin)
    val parts = new java.io.File(s"$root/staged").listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(System.currentTimeMillis() - (parts.length - i) * 60000L)
    }
    val schema = docs.schema

    def run(maxFiles: Int, tag: String): (Long, Double) = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFiles)
        .parquet(s"$root/staged")
      val t0 = System.nanoTime()
      val q = StreamDedup.start(in, s"$root/out-$tag", s"$root/ck-$tag",
        k = K, bands = Bands, shingleWidth = W, threshold = T)
      q.processAllAvailable()
      // per-batch decomposition to stderr (the artifact stays ONE JSON
      // line): durationMs separates plan/offset-log fixed costs from
      // addBatch (execution incl. state commit); the state operator's
      // commit/update times and the provider's custom metrics say whether
      // a per-batch floor is state-store commit machinery or query work
      q.recentProgress.foreach { p =>
        val so = p.stateOperators.headOption
        System.err.println(s"[sdprobe:$tag] batch=${p.batchId} " +
          s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
          so.fold("")(o => s"stateCommitMs=${o.commitTimeMs} " +
            s"updMs=${o.allUpdatesTimeMs} rmMs=${o.allRemovalsTimeMs} " +
            s"stateRows=${o.numRowsTotal} mem=${o.memoryUsedBytes} " +
            s"custom=${o.customMetrics}"))
      }
      q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      (spark.read.parquet(s"$root/out-$tag").count(), sec)
    }

    // throughput: `files` micro-batches of perTrigger files each
    val (multiSurv, multiSec) = run(perTrigger, "multi")
    // equality: everything in ONE batch — intra-batch ascending-docId
    // processing makes the result exactly the relational pair predicate
    val (oneSurv, oneSec) = run(files * perTrigger, "one")

    // relational twin of the keep-first predicate at these (K, Bands, T)
    val withSig = docs
      .withColumn("sh", array_distinct(MinHash.shingles(col("text"), W)))
      .withColumn("sig", MinHash.signature(col("sh"), K))
      .withColumn("bands", MinHash.bandHashes(col("sig"), K, Bands))
      .select(col("doc_id"), col("sig"),
        explode(col("bands")).as("band_hash"))
      .persist()
    val a = withSig.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("band_hash"))
    val b = withSig.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("band_hash"))
    val simExpr = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / lit(K)
    val dropped = a.join(b, "band_hash")
      .filter(col("id_a") < col("id_b"))
      .filter(simExpr >= T)
      .select(col("id_b")).distinct().count()
    withSig.unpersist()
    val batchSurv = total - dropped

    println(
      f"""{"op":"stream_dedup","sf_dir":"$sfDir","scale_x":$scale,"docs":$total,""" +
      f""""state_store":"$stateStore",""" +
      f""""k":$K,"bands":$Bands,"threshold":$T,"staged_files":${files * perTrigger},""" +
      f""""files_per_trigger":$perTrigger,"state_parts":"$stateParts",""" +
      f""""multi_batch":{"survivors":$multiSurv,"sec":$multiSec%.2f,""" +
      f""""docs_per_sec":${total / multiSec}%.0f},""" +
      f""""single_batch":{"survivors":$oneSurv,"sec":$oneSec%.2f},""" +
      f""""relational_twin_survivors":$batchSurv,""" +
      f""""single_equals_twin":${oneSurv == batchSurv},""" +
      f""""multi_equals_twin":${multiSurv == batchSurv}}""")
    spark.stop()
  }
}
