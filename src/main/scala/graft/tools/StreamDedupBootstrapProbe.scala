package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.streaming.StreamDedup

/** Measured evidence for [[graft.streaming.StreamDedup.bootstrapState]] —
  * the deploy shape of continual-ingest dedup: the history index is built
  * ONCE from the at-rest corpus (one batch shuffle, exact-collapsed), then
  * the stream checks new arrivals against it without ever replaying the
  * corpus through micro-batches.
  *
  * Probe design (self-validating): the history corpus is the documents
  * table replicated ×N with remapped ids and IDENTICAL bodies (the
  * clone-adversarial worst case — the bootstrap collapse must keep the
  * index at one entry per signature class, not ×N). The stream then
  * carries (a) every base document again under ids ABOVE the whole corpus
  * (exact clones of history → every one must drop) and (b) `novel`
  * synthetic documents over a disjoint token alphabet (no shared shingles
  * → survive). Expected survivors = the novel count exactly; any drift is
  * a correctness failure, not noise.
  *
  * Reported timings split where the cost lives: `first_batch_sec` pays the
  * bootstrap corpus shuffle + collapse (initial state binds lazily on
  * batch 0) plus one micro-batch; `rest_sec` is the remaining micro-batches
  * against the already-materialized state — the steady-state per-arrival
  * cost a production stream pays.
  *
  * Prints ONE JSON line. Run:
  *   SPARK_GRAFT_PROBE_SCALE=100 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.StreamDedupBootstrapProbe"
  * SPARK_GRAFT_STATE_STORE=rocksdb switches the state backend like
  * [[StreamDedupProbe]].
  */
object StreamDedupBootstrapProbe {
  private val K = 32
  private val Bands = 8
  private val W = 3
  private val T = 0.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val files = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "8").toInt
    val scale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "1").toInt
    val novel = sys.env.getOrElse("SPARK_GRAFT_PROBE_NOVEL", "1000").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val stateStore = StateStoreEnv(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val corpusLive =
      if (scale <= 1) base
      else base.crossJoin(spark.range(scale).withColumnRenamed("id", "__copy"))
        .withColumn("doc_id", col("doc_id") + col("__copy") * 10000000L)
        .drop("__copy")
    // materialize the history AT REST (parquet) before timing anything —
    // the deploy contract is an existing stored corpus, and the replay
    // probe's staged files are parquet too, so the comparison is fair.
    // repartition(cpus): the crossJoin replication otherwise lands in ~1
    // file and the bootstrap's scan+minhash stage (which rides the INPUT
    // layout, correctly — the engine must not force a reshuffle on a
    // 100 TB corpus) runs on a few cores — the same 1-file-corpus probe
    // artifact RESULTS_r9 §11 documented (measured here: 170 s at x100,
    // linear in corpus, all of it scan-stage underparallelization)
    val corpusRoot = java.nio.file.Files
      .createTempDirectory("graft-sdboot-corpus").toString
    corpusLive.repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$corpusRoot/corpus")
    val corpus = spark.read.parquet(s"$corpusRoot/corpus")
    val corpusN = corpus.count()

    // streamed arrivals: exact clones of history (ids above the corpus) +
    // novel docs over the disjoint token alphabet "zq<i>"
    val cloneArrivals = base
      .withColumn("doc_id", col("doc_id") + lit(100000000000L))
    // every token carries the FULL id — two distinct novel docs share zero
    // tokens, so they can never near-dup each other (tokens built from
    // residues mod small numbers measurably did: ids agreeing mod 2..13
    // shared 9/12 tokens and legitimately dropped)
    val novelArrivals = spark.range(novel)
      .select((col("id") + 200000000000L).as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit(s"zq${j}x"), col("id"))): _*).as("text"))
    val arrivals = cloneArrivals.unionByName(novelArrivals)
    val arrivalsN = arrivals.count()

    val root = java.nio.file.Files.createTempDirectory("graft-sdboot").toString
    arrivals.repartitionByRange(files, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$root/staged")
    val parts = new java.io.File(s"$root/staged").listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(System.currentTimeMillis() - (parts.length - i) * 60000L)
    }

    // SPARK_GRAFT_PROBE_SPLIT=1: time the collapsed-index computation alone
    // (the same DAG the initial-state bind executes inside batch 0) to split
    // corpus-collapse cost from initial-state-bind cost in first_batch_sec
    if (sys.env.get("SPARK_GRAFT_PROBE_SPLIT").contains("1")) {
      val keys = StreamDedup.bootstrapState(corpus, K, Bands, W).keys
      println("=== bootstrap index plan ===")
      println(keys.queryExecution.executedPlan.toString.take(8000))
      val s0 = System.nanoTime()
      val n = keys.count()
      val sec = (System.nanoTime() - s0) / 1e9
      println(f"""{"probe":"bootstrap_index_only","buckets":$n,"sec":$sec%.2f}""")
    }

    val in = spark.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/staged")
    val t0 = System.nanoTime()
    val q = StreamDedup.start(in, s"$root/out", s"$root/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T,
      bootstrap = Some(corpus))
    // first trigger pays the bootstrap (initial state binds on batch 0);
    // isActive guard: a batch-0 failure never publishes a progress event,
    // so without it the loop would spin forever instead of rethrowing
    while (q.isActive && (q.lastProgress == null ||
      q.lastProgress.numInputRows == 0)) Thread.sleep(50)
    if (!q.isActive) q.awaitTermination() // rethrows the batch-0 failure
    val firstSec = (System.nanoTime() - t0) / 1e9
    q.processAllAvailable()
    val totalSec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val survivors = spark.read.parquet(s"$root/out").count()

    println(
      f"""{"op":"stream_dedup_bootstrap","sf_dir":"$sfDir","scale_x":$scale,""" +
      f""""state_store":"$stateStore","corpus_docs":$corpusN,""" +
      f""""streamed_docs":$arrivalsN,"novel_docs":$novel,""" +
      f""""k":$K,"bands":$Bands,"threshold":$T,"staged_files":$files,""" +
      f""""first_batch_sec":$firstSec%.2f,"total_sec":$totalSec%.2f,""" +
      f""""rest_sec":${totalSec - firstSec}%.2f,""" +
      f""""survivors":$survivors,"expected_survivors":$novel,""" +
      f""""clones_all_dropped":${survivors == novel.toLong}}""")
    spark.stop()
  }
}
