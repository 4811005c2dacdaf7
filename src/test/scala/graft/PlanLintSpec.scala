package graft

/** Plan-quality lint over the ENTIRE declared inventory: the scale rules the
  * repo claims ("no cartesian products; nested-loop joins only for bounded
  * broadcast sides") become enforced invariants instead of review notes. A
  * new query that accidentally plans a CartesianProduct — or a
  * BroadcastNestedLoopJoin outside the curated allowlist of
  * bounded-build-side shapes — fails CI here, before any driver round.
  *
  * Planning-only (executedPlan is built, nothing runs), so the whole
  * registry lints in seconds on sf0.001.
  */
class PlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is INTENDED — every entry's
    * build side is provably bounded (a single-row aggregate, a collected
    * query vector, or a ≤tens-of-rows anchor/benchmark set), so the
    * nested loop is a per-row probe of a tiny broadcast, not an O(n·m)
    * blowup. Adding a name here is a conscious scale decision.
    */
  private val bnljAllowed: Set[String] = Set(
    // single-row corpus totals / normalizers broadcast under every row
    "unigram_logprob_scores", "bigram_logprob_scores",
    "dsir_importance_scores", "source_mixing_weights",
    "perplexity_buckets",
    // collected query vector / bounded anchor set vs the candidate scan
    "ann_bruteforce_topk", "ann_quantized_topk", "hard_negative_mining",
    // bounded benchmark/holdout side
    "decontaminate_bloom",
    // dense bucket frame (one row per bucket of the interval) vs aggregate
    "timeseries_zero_fill", "druid_json_timeseries_dense",
    "druid_json_moving_average", "window_moving_avg",
    // single-row stats (corpus length percentiles) joined under every row
    "length_histogram", "text_quality_scores", "curation_pipeline",
    "tfidf_top_terms", "line_dedup_stats",
    // bounded-prefix all-pairs ground truth (doc_id<200 / vec_id<100) with
    // a `<` join — the ORACLE shape; the scale path is the banded
    // MinHash/SimHash/LSH variants
    "ngram_jaccard_pairs", "embedding_near_dups",
    // pair algebra over the per-event-type sketch aggregate (5 rows)
    "theta_audience_overlap",
    // ON TRUE join of a SINGLE-ROW ungrouped sketch aggregate under each
    // of the 5 per-type rows (the subquery-sketch-intersection shape)
    "druid_sql_tuple",
    // 25-candidate re-rank stage: a bounded broadcast self-pair of the
    // top-C cut; stage 1 (the corpus pass) is an equi-free scan+top-k
    "mmr_diverse_topk")

  test("no query in the registry plans a CartesianProduct") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("BroadcastNestedLoopJoin appears only in the bounded-build allowlist") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(q.name))
        Some(q.name)
      else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: $offenders — either rewrite to an " +
        "equi/bucketed shape or add to the allowlist with a boundedness note")
  }

  test("select's threshold plans as TakeOrderedAndProject above the " +
      "offset window") {
    // the paging contract forces a full per-segment offset window (offsets
    // must be stable across pages), but the threshold cut itself must stay
    // a streaming top-k — a global Sort here would pay O(n log n) on every
    // page fetch
    val q = SparkEntry.registry.find(_.name == "druid_json_select_paged").get
    val plan = q.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("tfidf pins the vocab side as the broadcast BUILD side (AQE " +
      "side-flip guard)") {
    // Without the explicit hint, AQE's incremental re-optimization could
    // flip the build side to the 11.6M-row tf table once its
    // lz4-compressed shuffle cleared the threshold — streaming the join
    // through the vocab side's coalesced SINGLE partition (measured ×100:
    // 5 s → 29 s, bimodal by stage-completion order). The hint makes the
    // static plan a BroadcastHashJoin building the df (vocab) side, which
    // AQE will not overturn.
    val q = SparkEntry.registry.find(_.name == "tfidf_top_terms").get
    val plan = q.run(spark, sf).queryExecution.sparkPlan.toString
    val bhj = plan.linesIterator.find(_.contains("BroadcastHashJoin"))
    assert(bhj.isDefined, s"expected a BroadcastHashJoin in:\n$plan")
    assert(bhj.get.contains("BuildRight"),
      s"df (vocab) side must be the build side: ${bhj.get}")
  }
}
