package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] IVFADC (Jégou et al. TPAMI 2011 §IV): the combined ANN scale path —
  * IVF coarse clustering PRUNES (a query touches nProbe clusters, the
  * cluster id is the partition key at scale) and product quantization over
  * the RESIDUALS (vec − coarse centroid) COMPRESSES (m small ints per
  * vector). On clustered corpora residual PQ improves on raw PQ (residuals
  * concentrate near 0, so the codebook budget covers a tighter
  * distribution); on uniform random vectors the gain vanishes — measured
  * parity in IvfPqSpec, documented there — while the nProbe pruning remains
  * the point at scale.
  *
  * Search is per-cluster ADC: for each probed cluster c the query builds an
  * exact m×ks table of || (q − cent_c)_j − codebook_j[k] ||² (driver-side,
  * O(nProbe·m·ks)); each stored row's approximate distance is m lookups in
  * ITS cluster's table. The scan is code-table lookups only — no per-row
  * float vector math, and only over the probed clusters' partitions.
  *
  * All driver-side state is O(kCoarse·dim + m·ks·dim/m + nProbe·m·ks).
  */
final case class IvfPqIndex(
    coarse: Array[(Int, Array[Double])],
    cb: PqCodebook,
    /** (id, cluster, codes) — persisted by build() */
    encoded: DataFrame) {

  def close(): Unit = { encoded.unpersist(); () }

  /** Top-k by residual-ADC distance over the nProbe nearest clusters
    * (coarse nearness by L2², matching the ADC metric).
    */
  def search(query: Array[Float], topK: Int, nProbe: Int): DataFrame = {
    val q = query.map(_.toDouble)
    val probes = coarse.map { case (cid, c) => (cid, VectorMath.l2sqLocal(q, c)) }
      .sortBy { case (cid, d) => (d, cid) }.take(nProbe).map(_._1)

    // per-probed-cluster ADC tables on the query's residual
    val tables: Map[Int, Array[Array[Double]]] = probes.map { cid =>
      val cent = coarse.find(_._1 == cid).get._2
      val res = Array.tabulate(q.length)(i => q(i) - cent(i))
      cid -> Array.tabulate(cb.m) { j =>
        Array.tabulate(cb.ks) { k =>
          var s = 0.0; var d = 0
          while (d < cb.subDim) {
            val diff = res(j * cb.subDim + d) - cb.codebook(j)(k)(d)
            s += diff * diff; d += 1
          }
          s
        }
      }
    }.toMap
    val tLit = typedlit(tables)
    GraftFunctions.register(encoded.sparkSession)
    encoded
      .filter(col("cluster").isin(probes.toSeq: _*))
      // per-row table pick by cluster (map literal), then the native
      // adc_distance kernel — same codegen loop as the flat-PQ path
      .withColumn("approx_dist", call_function("adc_distance",
        col("codes"), element_at(tLit, col("cluster"))))
      // NULLS LAST — null ADC distances (corrupted codes) must not rank first
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(topK)
      .select(col("id"), col("cluster"), round(col("approx_dist"), 6).as("approx_dist"))
  }

  /** IVFADC+R (the paper's §V refinement, r10): ADC shortlist over the
    * probed clusters, exact-L2 re-rank of only that sliver against the
    * original vectors. Bare residual-ADC cannot rank dense neighborhoods
    * (measured 0.073 recall@10 at ×100 on BOTH probe corpora — within a
    * tight natural cluster the true top-10's distance gaps sit inside the
    * residual quantization noise), but it DOES concentrate the true
    * neighbors into a small shortlist; `oversample`·topK exact distances
    * recover the ranking at negligible cost next to the pruned code scan.
    */
  def searchRerank(vectors: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], topK: Int, nProbe: Int,
      oversample: Int = 30): DataFrame = {
    val shortlist = search(query, topK * oversample, nProbe)
      .select(col("id"), col("cluster"))
    val qLit = typedlit(query)
    vectors
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
      .join(broadcast(shortlist), Seq("id"))
      .withColumn("approx_dist", VectorMath.l2sqCol(col("__v"), qLit))
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(topK)
      .select(col("id"), col("cluster"),
        round(col("approx_dist"), 6).as("approx_dist"))
  }

  /** IVF-FLAT fallback search (advice/verdict r7 #3): keep the coarse
    * nProbe pruning — the part of IVFADC that scales — but score the
    * probed clusters' rows with EXACT L2² against the caller's original
    * vectors instead of lossy residual-PQ codes. Used when
    * [[PqIndex.sampledRecall]] says the codes cannot rank this corpus
    * (near-uniform embeddings: measured 0.007–0.073 recall@10 at ×100,
    * vs ~0.9 for the flat path — ANN_RECALL_r7/r8). Cost: exact float math
    * over nProbe/kCoarse of the corpus instead of code lookups — the same
    * candidate set, so pruning and partition locality at scale are
    * unchanged. `vectors` must be the corpus the index was built from. */
  def searchFlat(vectors: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], topK: Int, nProbe: Int): DataFrame = {
    val q = query.map(_.toDouble)
    val probes = coarse.map { case (cid, c) => (cid, VectorMath.l2sqLocal(q, c)) }
      .sortBy { case (cid, d) => (d, cid) }.take(nProbe).map(_._1)
    val qLit = typedlit(query)
    encoded
      .filter(col("cluster").isin(probes.toSeq: _*))
      .select(col("id"), col("cluster"))
      .join(vectors.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("__v")), Seq("id"))
      .withColumn("approx_dist", VectorMath.l2sqCol(col("__v"), qLit))
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(topK)
      .select(col("id"), col("cluster"),
        round(col("approx_dist"), 6).as("approx_dist"))
  }
}

object IvfPq {

  /** Build: IVF coarse assignment (deterministic farthest-first seeding via
    * [[IvfIndex]]), residuals against the coarse centroids, PQ codebooks
    * trained ON the residuals, every vector stored as (cluster, codes).
    */
  def build(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      kCoarse: Int, m: Int = 8, ks: Int = 256, iterations: Int = 4): IvfPqIndex = {
    val ivf = IvfIndex.build(spark, df, idCol, vecCol, kCoarse, iterations)
    try {
      // dense positional table (cluster id → centroid): Lloyd's refit drops
      // clusters that lost all members, so ids can be sparse — rows never
      // carry a dropped id, the zero-filled gaps are unreachable
      val cents: Array[Array[Double]] = {
        val byId = ivf.centroids.toMap
        val dim = ivf.centroids.head._2.length
        Array.tabulate(ivf.centroids.map(_._1).max + 1)(
          i => byId.getOrElse(i, Array.fill(dim)(0.0)))
      }
      val centLit = typedlit(cents)
      val residuals = ivf.indexed.withColumn("res",
        zip_with(col("vec"), element_at(centLit, col("cluster") + 1),
          (x, y) => x.cast("double") - y))
      val cb = PqIndex.train(spark, residuals, "id", "res", m, ks, iterations)
      GraftFunctions.register(spark)
      val encoded = residuals
        .select(col("id"), col("cluster"),
          call_function("pq_encode", col("res"), typedlit(cb.codebook)).as("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      encoded.count() // materialize before releasing the IVF assignment
      IvfPqIndex(ivf.centroids, cb, encoded)
    } finally ivf.close()
  }
}
