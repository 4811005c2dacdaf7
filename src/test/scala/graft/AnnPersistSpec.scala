package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{IvfIndex, IvfPq, PqIndex}
import graft.sink.AnnIndexStore

/** ANN index persistence ([[AnnIndexStore]]): a saved+loaded index returns
  * results identical to the freshly built one for every index kind, the
  * `exists` commit marker gates on the LAST-written artifact, and `close()`
  * releases the persisted row-level state.
  */
class AnnPersistSpec extends SparkSpec {

  import spark.implicits._

  /** 60 deterministic 8-dim vectors in 3 well-separated lobes. */
  private lazy val vecs: DataFrame = (0 until 60).map { i =>
    val lobe = i % 3
    val v = Array.tabulate(8)(d =>
      (if (d % 3 == lobe) 10f else 0f) + ((i * 7 + d * 13) % 5) * 0.1f)
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  private def query: Array[Float] =
    vecs.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray

  test("cache root defaults under the warehouse dir (cluster-visible), not node-local /tmp") {
    val root = graft.queries.VectorQueries.annCacheRoot(spark)
    assert(!root.startsWith("/tmp"),
      s"ANN cache root must not be node-local: $root")
    assert(root.contains(spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")),
      s"default root should live under the warehouse dir: $root")
    // explicit override wins (any Hadoop FS URI)
    spark.conf.set("spark.graft.ann.cacheDir", "hdfs://nn/graft/ann")
    try assert(graft.queries.VectorQueries.annCacheRoot(spark) == "hdfs://nn/graft/ann")
    finally spark.conf.unset("spark.graft.ann.cacheDir")
  }

  test("PQ: save → load → search is identical to fresh build; close releases") {
    val cb = PqIndex.train(spark, vecs, "vec_id", "embedding", m = 4, ks = 8,
      iterations = 3)
    val codes = PqIndex.encode(vecs, "vec_id", "embedding", cb)
    val fresh = PqIndex.search(codes, query, cb, topK = 5).collect().toSeq

    val path = Files.createTempDirectory("graft-annpq").toString + "/idx"
    assert(!AnnIndexStore.exists(spark, path, "pq"))
    AnnIndexStore.savePq(path, cb, codes)
    assert(AnnIndexStore.exists(spark, path, "pq"))

    val loaded = AnnIndexStore.loadPq(spark, path)
    assert(loaded.cb == cb.copy(codebook = loaded.cb.codebook)) // m/ks/subDim
    assert(loaded.cb.codebook.flatten.flatten.toSeq == cb.codebook.flatten.flatten.toSeq)
    val replayed = PqIndex.search(loaded.encoded, query, loaded.cb, topK = 5)
      .collect().toSeq
    assert(replayed == fresh)

    assert(loaded.encoded.storageLevel != StorageLevel.NONE)
    loaded.close()
    assert(loaded.encoded.storageLevel == StorageLevel.NONE)
  }

  test("IVF-flat: save → load → search identical; close releases") {
    val built = IvfIndex.build(spark, vecs, "vec_id", "embedding", k = 3,
      iterations = 3)
    val fresh = built.search(spark, query, topK = 5, nProbe = 2)
      .withColumn("cos_sim", round($"cos_sim", 9)).collect().toSeq

    val path = Files.createTempDirectory("graft-annivf").toString + "/idx"
    AnnIndexStore.saveIvf(path, built)
    built.close()
    assert(AnnIndexStore.exists(spark, path, "ivf"))

    val loaded = AnnIndexStore.loadIvf(spark, path)
    assert(loaded.centroids.map(_._1).toSeq == built.centroids.map(_._1).toSeq)
    val replayed = loaded.search(spark, query, topK = 5, nProbe = 2)
      .withColumn("cos_sim", round($"cos_sim", 9)).collect().toSeq
    assert(replayed == fresh)

    assert(loaded.indexed.storageLevel != StorageLevel.NONE)
    loaded.close()
    assert(loaded.indexed.storageLevel == StorageLevel.NONE)
  }

  test("IVFADC: save → load → search identical; codebook is the commit marker") {
    val built = IvfPq.build(spark, vecs, "vec_id", "embedding", kCoarse = 3,
      m = 4, ks = 8, iterations = 3)
    val fresh = built.search(query, topK = 5, nProbe = 2).collect().toSeq

    val path = Files.createTempDirectory("graft-annivfpq").toString + "/idx"
    AnnIndexStore.saveIvfPq(path, built)
    built.close()
    assert(AnnIndexStore.exists(spark, path, "ivfpq"))

    val loaded = AnnIndexStore.loadIvfPq(spark, path)
    val replayed = loaded.search(query, topK = 5, nProbe = 2).collect().toSeq
    assert(replayed == fresh)
    loaded.close()
    assert(loaded.encoded.storageLevel == StorageLevel.NONE)

    // a partial write (no codebook yet) must NOT read as committed
    val partial = Files.createTempDirectory("graft-annpart").toString + "/idx"
    Seq((0, Seq(0.0))).toDF("cluster", "centroid")
      .write.parquet(s"$partial/centroids")
    assert(!AnnIndexStore.exists(spark, partial, "ivfpq"))
    assert(intercept[IllegalArgumentException] {
      AnnIndexStore.exists(spark, partial, "hnsw")
    }.getMessage.contains("hnsw"))
  }

  test("re-save drops the commit marker first (no stale marker mid-overwrite)") {
    val cb = PqIndex.train(spark, vecs, "vec_id", "embedding", m = 4, ks = 8,
      iterations = 2)
    val codes = PqIndex.encode(vecs, "vec_id", "embedding", cb)
    val path = Files.createTempDirectory("graft-annresave").toString + "/idx"
    AnnIndexStore.savePq(path, cb, codes)
    assert(AnnIndexStore.exists(spark, path, "pq"))
    // simulate the start of a re-save: after dropMarker (the first step of
    // savePq), exists() must be false until the new codebook lands —
    // proven by a full re-save leaving a committed, loadable index
    AnnIndexStore.savePq(path, cb, codes)
    assert(AnnIndexStore.exists(spark, path, "pq"))
    val loaded = AnnIndexStore.loadPq(spark, path)
    assert(PqIndex.search(loaded.encoded, query, loaded.cb, topK = 3)
      .collect().length == 3)
    loaded.close()
  }
}
