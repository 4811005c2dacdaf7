package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] SEMANTIC deduplication over an embedding column — the SemDeDup
  * shape (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus in
  * embedding space, then deduplicate *within* each cluster by pairwise
  * cosine, keeping one representative per group of semantic duplicates.
  *
  * Why clustering first: corpus-wide pairwise cosine is O(n²) — the paper's
  * observation is that semantic duplicates land in the same k-means cluster,
  * so the pair search only needs to run inside clusters: O(Σ|cᵢ|²), and in
  * Spark terms the pair join becomes an EQUI-join on the cluster id (one
  * shuffle keyed by cluster, each cluster's pairs computed where its rows
  * land) instead of a cross join. At 100 TB the cluster id is the partition
  * key and k scales with corpus size to bound |cᵢ|.
  *
  * Survivor selection: connected components over the within-cluster pair
  * graph ([[Dedup.components]] min-label propagation), keep the minimum id
  * per component. (The paper keeps the member with the LOWEST centroid
  * similarity; min-id is the deterministic, oracle-checkable variant — the
  * choice of representative is policy, the component structure is the
  * algorithm. Documented delta.)
  *
  * Recall caveat (inherent to SemDeDup, not this implementation): a dup pair
  * split across a cluster boundary is missed. EXACT duplicates (identical
  * vectors) are never split — identical inputs get identical cluster
  * assignments — so exact-dup recall is 1 by construction; near-dup recall
  * follows the paper's empirical argument.
  */
object SemDedup {

  /** Within-cluster candidate pairs: (idA, idB) with cosine ≥ threshold and
    * idA < idB, where both rows share `clusterCol`. Pure equi-join on the
    * cluster key — no corpus-wide cross product.
    */
  def clusterPairs(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, threshold: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession) // cosine_sim (idempotent)
    val a = df.select(col(clusterCol).as("__c"), col(idCol).cast("long").as("id_a"),
      col(vecCol).as("__va"))
    val b = df.select(col(clusterCol).as("__c"), col(idCol).cast("long").as("id_b"),
      col(vecCol).as("__vb"))
    a.join(b, Seq("__c"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cos", CosineSimilarity(col("__va"), col("__vb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Full semantic-dedup assignment: every row of `df` mapped to its
    * component canonical (min id; rows with no semantic dup are their own
    * canonical) plus the survivor flag. Filter `is_survivor = 1` for the
    * deduplicated corpus.
    */
  def survivors(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, threshold: Double): DataFrame =
    Dedup.assignCanonical(df, idCol,
      clusterPairs(df, idCol, vecCol, clusterCol, threshold), "id_a", "id_b")

  /** Scale path: no pre-existing cluster column — build one with IVF k-means
    * ([[IvfIndex]]: deterministic farthest-first seeding + Lloyd passes),
    * then dedup within the learned clusters. Returns (idCol, cluster,
    * canonical, is_survivor).
    */
  def survivorsIvf(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, k: Int, threshold: Double,
      iterations: Int = 5): DataFrame = {
    val index = IvfIndex.build(spark, df, idCol, vecCol, k, iterations)
    try {
      val clustered = index.indexed
        .select(col("id").as(idCol), col("vec").as(vecCol), col("cluster"))
      val out = survivors(clustered, idCol, vecCol, "cluster", threshold)
        .join(clustered.select(col(idCol), col("cluster")), Seq(idCol))
        .select(col(idCol), col("cluster"), col("canonical"), col("is_survivor"))
        .persist()
      // materialize before releasing the index cache — the result otherwise
      // re-runs the whole cluster assignment on every downstream action
      out.count()
      out
    } finally index.close()
  }
}
