package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] IVF-flat approximate nearest neighbour index (SURVEY builder prompt:
  * "an IVF or LSH-bucketed variant as the scale path").
  *
  * Classic inverted-file construction, Spark-first:
  *  1. deterministic seed centroids (first k vectors by id — reproducible, no
  *     RNG state) refined by `iterations` Lloyd passes, each pass one
  *     distributed assignment (broadcast centroids, no shuffle of the
  *     vectors) + one distributed mean (posexplode → groupBy(cluster, dim));
  *  2. every vector stored with its cluster id — at scale this column is the
  *     partition/bucket key, so a query touches only `nProbe` clusters:
  *     expected probe cost O(nProbe · n / k) instead of O(n).
  *
  * The centroid table (k × dim doubles) is the only driver-side state —
  * bounded by k, independent of n, broadcast to executors for assignment.
  */
final class IvfIndex private (
    val indexed: DataFrame, // (id, vec, cluster) — persisted by build()
    val centroids: Array[(Int, Array[Double])]) extends Serializable {

  /** Release the persisted assignment when the index is no longer needed. */
  def close(): Unit = { indexed.unpersist(); () }

  /** Top-k cosine search probing the nProbe clusters nearest to the query. */
  def search(spark: SparkSession, query: Array[Float], topK: Int, nProbe: Int): DataFrame = {
    val probes = centroids
      .map { case (cid, c) => (cid, IvfIndex.cosineLocal(query.map(_.toDouble), c)) }
      .sortBy { case (_, sim) => -sim }
      .take(nProbe).map(_._1)
    indexed
      .filter(col("cluster").isin(probes.toSeq: _*))
      .withColumn("cos_sim", CosineSimilarity(col("vec"), typedlit(query)))
      .orderBy(col("cos_sim").desc, col("id"))
      .limit(topK)
      .select(col("id"), col("cluster"), col("cos_sim"))
  }
}

object IvfIndex {

  /** Reassemble an index from persisted parts ([[graft.sink.AnnIndexStore]]
    * load path) — same shape `build` produces. */
  private[graft] def fromParts(indexed: DataFrame,
      centroids: Array[(Int, Array[Double])]): IvfIndex =
    new IvfIndex(indexed, centroids)

  private[functions] def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Build the index over (idCol: long, vecCol: array<float>).
    *
    * Seeding is deterministic farthest-first (the k-means++ spreading idea
    * minus its RNG): seed 1 = vector with the smallest xxhash64(id)
    * (arbitrary-but-stable, not biased toward low ids); each next seed
    * maximizes cosine distance to its nearest chosen seed, ties broken by
    * hash then id. Each pick is one distributed argmax over the broadcast
    * seed list — k scans at build time, no vector shuffle, driver state
    * still O(k·dim).
    */
  def build(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 5): IvfIndex = {
    GraftFunctions.register(spark)
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))

    // the farthest-first loop below runs kEff distributed argmax scans and
    // each Lloyd pass two more passes over the same rows — persist once so
    // build time is O(k) over a cached frame, not k re-reads of the source
    val hashed = base.withColumn("__h", xxhash64(col("id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // k is capped at n: with fewer vectors than requested clusters the
    // farthest-first loop would re-pick already-chosen vectors forever
    // (duplicate centroids, empty clusters). Counting the PERSISTED frame
    // warms the cache — the count pass is also the cache fill, not an
    // extra read of the source.
    val n = hashed.count()
    if (n == 0) { hashed.unpersist(); throw new IllegalArgumentException(
      "IvfIndex.build: input has no vectors") }
    val kEff = math.min(k, n).toInt
    def vecOf(df0: DataFrame): Array[Double] =
      df0.limit(1).select(col("vec")).collect().head
        .getSeq[Float](0).map(_.toDouble).toArray
    val seeds = scala.collection.mutable.ArrayBuffer(
      vecOf(hashed.orderBy(col("__h"), col("id"))))
    while (seeds.length < kEff) {
      val distCols = seeds.toSeq.map(c =>
        lit(1.0) - CosineSimilarity(col("vec"), typedlit(c)))
      val minDist = if (distCols.size == 1) distCols.head else least(distCols: _*)
      seeds += vecOf(hashed.withColumn("__mind", minDist)
        .orderBy(col("__mind").desc, col("__h"), col("id")))
    }
    var cents: Array[(Int, Array[Double])] =
      seeds.zipWithIndex.map { case (c, i) => (i, c) }.toArray

    // Lloyd passes read the same rows as seeding: route them through the
    // cached frame (Spark's cache manager substitutes the persisted subtree)
    val cachedBase = hashed.drop("__h")
    var assigned = assign(spark, cachedBase, cents)
    for (_ <- 0 until iterations) {
      // distributed mean per (cluster, dim) -> new centroids
      cents = assigned
        .select(col("cluster"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("pairs"))
        .select(col("cluster"), col("pairs.m").as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      assigned = assign(spark, cachedBase, cents)
    }
    // materialize the final assignment before releasing the build cache so
    // the index doesn't silently re-read the source k+iterations times later
    val index = new IvfIndex(assigned.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), cents)
    index.indexed.count()
    hashed.unpersist()
    index
  }

  /** Distributed assignment: nearest centroid by cosine, vectors unshuffled
    * (centroid argmin evaluated per row against the broadcast literal table).
    */
  private def assign(spark: SparkSession, base: DataFrame,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    // argmin over k centroid literals, computed as a fold over (cid, sim)
    val simCols = cents.toSeq.map { case (cid, c) =>
      struct(CosineSimilarity(col("vec"), typedlit(c)).as("sim"), lit(cid).as("cid"))
    }
    base.withColumn("cluster",
      greatest(simCols: _*).getField("cid"))
  }
}
