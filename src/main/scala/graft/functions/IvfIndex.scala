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
    // idempotent: a LOADED index (AnnIndexStore) may be the session's first
    // touch of the custom expressions — build() registering is not enough
    GraftFunctions.register(spark)
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

  /** Top-k EXACT-L2 search probing clusters near the query — the IVF-flat
    * fallback target for the PQ query paths (verdict r7 #2), whose metric
    * is L2², not cosine. Cluster MEMBERSHIP was assigned by cosine
    * (direction), so on unnormalized corpora the L2-nearest centroids can
    * miss the clusters that hold the L2-nearest members (review finding
    * r8) — the probe set is therefore the UNION of the nProbe L2-nearest
    * and the nProbe cosine-nearest centroids (≤ 2·nProbe clusters; both
    * rankings are driver-side flops over k centroids). Scored candidates
    * carry exact squared distances. */
  def searchFlatL2(spark: SparkSession, query: Array[Float], topK: Int,
      nProbe: Int): DataFrame = {
    GraftFunctions.register(spark)
    val q = query.map(_.toDouble)
    val byL2 = centroids.map { case (cid, c) => (cid, VectorMath.l2sqLocal(q, c)) }
      .sortBy { case (cid, d) => (d, cid) }.take(nProbe).map(_._1)
    val byCos = centroids
      .map { case (cid, c) => (cid, IvfIndex.cosineLocal(q, c)) }
      .sortBy { case (cid, sim) => (-sim, cid) }.take(nProbe).map(_._1)
    val probes = (byL2 ++ byCos).distinct
    val qLit = typedlit(query)
    indexed
      .filter(col("cluster").isin(probes.toSeq: _*))
      .withColumn("approx_dist", VectorMath.l2sqCol(col("vec"), qLit))
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(topK)
      .select(col("id"), col("cluster"),
        round(col("approx_dist"), 6).as("approx_dist"))
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
    * minus its RNG) over a BOUNDED deterministic sample: the
    * min(n, max(10 000, 50·k)) vectors with the smallest xxhash64(id)
    * (arbitrary-but-stable, not biased toward low ids) collect to the
    * driver — O(sample·dim) memory, ~6 MB at k=256/dim=64 — and the
    * farthest-first picks run as tight local loops with an INCREMENTAL
    * min-distance array (seed 1 = smallest hash; each next seed maximizes
    * cosine distance to its nearest chosen seed; ties resolve to the
    * smaller hash/id). The earlier distributed formulation ran pick i as an
    * argmax whose expression re-scored all i prior seeds — O(k²·n) cosines
    * total, ~5 BILLION at k≈200/n≈200k (measured minutes of build time
    * before the first Lloyd pass; at 100 TB it would never finish). The
    * sample cap bounds seeding at O(k·sample) local flops while Lloyd's
    * refinement below still runs over the FULL corpus, so centroid quality
    * at convergence is unchanged.
    */
  def build(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 5): IvfIndex = {
    GraftFunctions.register(spark)
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))

    // Lloyd passes run two scans each over the same rows — persist once.
    val hashed = base.withColumn("__h", xxhash64(col("id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // k is capped at n (fewer vectors than clusters would mean duplicate
    // centroids / empty clusters). Counting the PERSISTED frame warms the
    // cache — the count pass is also the cache fill.
    val n = hashed.count()
    if (n == 0) { hashed.unpersist(); throw new IllegalArgumentException(
      "IvfIndex.build: input has no vectors") }
    val kCap = math.min(k, n).toInt
    val sampleSize = math.min(n, math.max(10000L, 50L * kCap)).toInt
    // sample DISTINCT vectors (deterministic min-hash representative per
    // vector): on a duplicate-heavy corpus a raw row sample can hold fewer
    // distinct vectors than k, and once every distinct sample vector is a
    // seed the farthest-first argmax (all minDist 0) would emit duplicate
    // centroids — silently collapsing the index to far fewer clusters
    // (review finding r7). One vec-keyed shuffle at build time, bounded by
    // the same scan budget as a Lloyd pass.
    val sample: Array[Array[Double]] = hashed
      .groupBy(col("vec"))
      .agg(min(col("__h")).as("__h"), min(col("id")).as("id"))
      .orderBy(col("__h"), col("id")).limit(sampleSize)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // fewer distinct vectors than k ⇒ k collapses to them (the sample is
    // exhaustive exactly when it is smaller than sampleSize)
    val kEff = math.min(kCap, sample.length)
    val chosen = new Array[Int](kEff)
    chosen(0) = 0 // smallest hash — same first seed as the distributed form
    val minDist = sample.map(v => 1.0 - cosineLocal(v, sample(0)))
    var s = 1
    while (s < kEff) {
      var best = 0; var bestD = Double.NegativeInfinity
      var i = 0
      while (i < sample.length) {
        if (minDist(i) > bestD) { bestD = minDist(i); best = i }
        i += 1
      }
      chosen(s) = best
      i = 0
      while (i < sample.length) {
        val d = 1.0 - cosineLocal(sample(i), sample(best))
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
      s += 1
    }
    var cents: Array[(Int, Array[Double])] =
      chosen.zipWithIndex.map { case (idx, i) => (i, sample(idx)) }

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
