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
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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

    // id-range-ordered staging: partition 0 = lowest ids, so path-ordered
    // pickup approximates ascending arrival (throughput path only)
    docs.repartitionByRange(files, col("doc_id"))
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
      q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      (spark.read.parquet(s"$root/out-$tag").count(), sec)
    }

    // throughput: one staged file per micro-batch
    val (multiSurv, multiSec) = run(1, "multi")
    // equality: everything in ONE batch — intra-batch ascending-docId
    // processing makes the result exactly the relational pair predicate
    val (oneSurv, oneSec) = run(files, "one")

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
      f""""k":$K,"bands":$Bands,"threshold":$T,"staged_files":$files,""" +
      f""""multi_batch":{"survivors":$multiSurv,"sec":$multiSec%.2f,""" +
      f""""docs_per_sec":${total / multiSec}%.0f},""" +
      f""""single_batch":{"survivors":$oneSurv,"sec":$oneSec%.2f},""" +
      f""""relational_twin_survivors":$batchSurv,""" +
      f""""single_equals_twin":${oneSurv == batchSurv},""" +
      f""""multi_equals_twin":${multiSurv == batchSurv}}""")
    spark.stop()
  }
}
