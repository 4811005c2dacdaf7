package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Near-dup DEDUPLICATION — from candidate pairs to a deduped corpus
  * (SURVEY §2.11 north star: the pair list is only half the operator; a
  * training pipeline needs the survivors).
  *
  * Connected components over the pair graph by iterative min-label
  * propagation: each round, every node takes the min label among itself and
  * its neighbours — one join + one aggregation per round, converging in
  * O(component diameter) rounds (near-dup clusters are shallow; the loop is
  * a driver-side CONTROL loop, all data stays distributed). Convergence is
  * detected by the monotonically decreasing label sum — one cheap agg, no
  * row-wise diff join.
  *
  * The converged labels frame stays cached for the result's lifetime (the
  * loop unpersists every predecessor); batch pipelines deduplicating many
  * corpora in one session should write each result out and clear caches
  * between corpora.
  */
object Dedup {

  /** Reliable-checkpoint cadence for deep graphs: every N rounds the label
    * RDD is checkpointed (when a checkpoint dir is configured), bounding the
    * linearly growing RDD-lineage recompute depth at N rounds. */
  private val CheckpointEvery = 10

  /** (id, canonical) for every node of `pairs` (both columns), canonical =
    * min id in the node's connected component.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
      maxIterations: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    // empty pair graph (nothing near-duplicated): no components to compute —
    // and sum() over an empty frame is NULL, so bail before the loop
    if (labels.isEmpty) {
      edges.unpersist()
      return labels.select(col("id"), col("label").as("canonical"))
    }
    var prevSum = labels.agg(sum(col("label"))).head().getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      iter += 1
      val neighbourMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nl"), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      // Lineage truncation: the self-referencing join otherwise DOUBLES the
      // logical plan every round (2^rounds tree nodes — planner blows up
      // near round ~12, long before any data-size limit). Wrapping the
      // round's RDD in a fresh LogicalRDD keeps the plan O(1) while the
      // persist stays a normal CacheManager entry — unlike localCheckpoint,
      // whose RDD-level blocks Dataset.unpersist cannot release (they'd
      // accumulate one full label snapshot per round). The RDD chain grows
      // linearly between reliable checkpoints; every CheckpointEvery rounds
      // (when the session has a checkpoint dir) the chain is cut to storage,
      // bounding recompute depth for graphs whose diameter exceeds it.
      val round = labels.join(neighbourMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val spark = labels.sparkSession
      val roundRdd = round.rdd
      if (iter % CheckpointEvery == 0 && spark.sparkContext.getCheckpointDir.isDefined)
        roundRdd.checkpoint() // materialized by the convergence agg below
      val next = spark.createDataFrame(roundRdd, round.schema).persist()
      val sumNow = next.agg(sum(col("label"))).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = sumNow == prevSum // labels only ever decrease
      prevSum = sumNow
    }
    edges.unpersist()
    // Unconverged exit would return labels that LOOK like components but are
    // wrong for any component whose diameter exceeds maxIterations (min-label
    // moves one hop per round). Silent wrong answers are worse than failure:
    // refuse, and tell the caller which knob to turn.
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"Dedup.components did not converge after $maxIterations iterations; " +
          "a connected component's diameter exceeds the cap. Raise maxIterations " +
          "(rounds needed ~= largest component diameter).")
    }
    labels.select(col("id"), col("label").as("canonical"))
  }

  /** Deduped corpus assignment: every doc of `docs` mapped to its cluster
    * canonical (docs without any near-dup partner are their own canonical),
    * plus the survivor flag. Keep `is_survivor` rows for the deduped corpus.
    */
  def assignCanonical(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val comp = components(pairs, aCol, bCol)
    docs.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("canonical"), col("id")).as("canonical"))
      .withColumn("is_survivor", (col(idCol) === col("canonical")).cast("int"))
  }
}
