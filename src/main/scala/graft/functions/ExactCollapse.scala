package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Exact-duplicate pre-collapse for the pair-emitting LSH dedups.
  *
  * Identical texts have identical shingle sets, minhash signatures, and
  * simhash fingerprints, so every member of an exact-duplicate class
  * collides in exactly the same buckets and verifies with exactly the same
  * jaccard as its class representative. The pair set over the full corpus is
  * therefore recoverable from the pair set over DISTINCT texts:
  *
  *   - within a class: every id pair, jaccard exactly 1.0 (identical
  *     shingle sets);
  *   - across classes: every member×member combination inherits the
  *     representative pair's jaccard (members are byte-identical to reps).
  *
  * This turns the EXPENSIVE part (signatures + bucket self-join + per-pair
  * set verification) from corpus-sized to distinct-text-sized. On a
  * duplicate-heavy corpus that is the difference between quadratic work in
  * clone-class SIZE and work linear in class COUNT: the ×100 scale probe's
  * replicated corpus (every doc cloned 100×, classes of 100+) ran the
  * uncollapsed minhash pipeline in 222 s — almost all of it verifying the
  * ~25M candidate pairs the clone classes induce — and a real web crawl at
  * 100 TB (typically 30–60% exact dups) has the same shape. The OUTPUT is
  * still the full quadratic pair enumeration (that is the API's contract);
  * it is just produced by a cheap explode instead of per-pair verification.
  *
  * Exactness: bit-for-bit the same rows as running the raw pipeline over
  * the full corpus, for any pair function whose output depends only on the
  * two texts and whose candidate generation is text-deterministic — both
  * MinHash band-hash collision and SimHash Hamming banding are.
  */
object ExactCollapse {

  /** @param pairsOnDistinct the underlying (id, text) → (id_a, id_b,
    *   jaccard) pipeline, invoked on one representative (min id) per
    *   distinct text. */
  def pairsByText(df: DataFrame, idCol: String, textCol: String,
      threshold: Double)(pairsOnDistinct: DataFrame => DataFrame): DataFrame = {
    // one row per DISTINCT text; the member list is bounded by clone-class
    // size, which also bounds the (mandatory) output pair count. Cached for
    // ONE materialization of the result (CacheScope releases it after the
    // first action — advice r7) because it feeds THREE consumers (reps,
    // within-class expansion, member join) and AQE does not reuse exchanges
    // across those branches — unpersisted, each re-derives the corpus
    // groupBy. Callers looping over MANY corpora should checkpoint the
    // class table to storage instead (it carries the full distinct texts —
    // the heaviest of the sibling caches).
    graft.pipeline.CacheScope.withCached(df
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .groupBy(col("__text"))
      // collect_SET, not list: input containing duplicated (id, text) rows
      // must not yield repeated ids in the class, or the within-class
      // expansion would emit self-pairs (id_a == id_b) that the raw
      // pipeline's strict id_a < id_b candidate filter never produces.
      .agg(sort_array(collect_set(col("id"))).as("ids"))
    ) { classes =>
    val reps = classes.select(element_at(col("ids"), 1).as("id"),
      col("__text").as("text"))
    val repPairs = pairsOnDistinct(reps)

    // (a) within-class pairs: identical texts, jaccard exactly 1.0. A null
    // text has a null shingle set, so the raw pipeline emits nothing for
    // it — exclude the null class here too. ids sort ascending, so pairing
    // each element with its successors keeps id_a < id_b.
    val within0 = classes
      .filter(col("__text").isNotNull && size(col("ids")) >= 2)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .withColumn("jaccard", lit(1.0))
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val within = if (threshold <= 1.0) within0 else within0.limit(0)

    // (b) cross-class pairs: members inherit their representatives' pairs.
    // Ids sort ascending WITHIN a class but interleave across classes, so
    // each expanded pair re-orders explicitly.
    val members = classes.select(element_at(col("ids"), 1).as("rep"), col("ids"))
    val cross = repPairs
      .join(members.select(col("rep").as("id_a"), col("ids").as("ids_a")), "id_a")
      .join(members.select(col("rep").as("id_b"), col("ids").as("ids_b")), "id_b")
      .select(explode(col("ids_a")).as("ma"), col("ids_b"), col("jaccard"))
      .select(col("ma"), explode(col("ids_b")).as("mb"), col("jaccard"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("jaccard"))

    within.unionByName(cross)
    }
  }
}
