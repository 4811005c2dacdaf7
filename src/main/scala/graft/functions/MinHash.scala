package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] MinHash + LSH near-duplicate detection (SURVEY §2.11 north star;
  * classic shingle → minhash → band → bucket-join construction).
  *
  * All column-level steps are higher-order functions (codegen'd); the only
  * shuffle is the band-bucket groupBy/self-join — at 100 TB that shuffle
  * carries (docId, bandHash) pairs, i.e. `numBands × n` small rows, not
  * documents. Candidate verification re-joins the shingle sets only for
  * bucket-colliding pairs.
  */
object MinHash {

  /** w-word shingles of a text column (space-tokenized). */
  def shingles(text: Column, w: Int = 3): Column = {
    val words = split(text, " ")
    when(size(words) < w, array(concat_ws(" ", words)))
      .otherwise(
        transform(sequence(lit(0), size(words) - w),
          i => concat_ws(" ", slice(words, i + 1, lit(w)))))
  }

  /** Strict variant: docs shorter than w words yield NO shingles —
    * decontamination semantics (a 3-word doc cannot contain a 5-gram),
    * where [[shingles]] degrades short docs to a whole-text shingle
    * (near-dup semantics: short docs should still collide). The single
    * definition keeps the exact query, its Bloom-prefiltered twin, and the
    * bench variants byte-identical.
    */
  def strictShingles(text: Column, w: Int): Column = {
    val words = split(text, " ")
    when(size(words) >= w,
      transform(sequence(lit(1), size(words) - (w - 1)),
        i => concat_ws(" ", slice(words, i, lit(w)))))
      .otherwise(array())
  }

  /** k minhash values: min over shingles of xxhash64(seed_j ++ shingle).
    * Native one-pass [[MinHashSig]] (requires [[GraftFunctions.register]]).
    */
  def signature(shingleCol: Column, k: Int = 32): Column =
    org.apache.spark.sql.functions.call_function("minhash_sig", shingleCol, lit(k))

  /** HOF twin of [[signature]] (k folds; registration-free reference,
    * bit-identical — cross-checked in FunctionsSpec).
    */
  def signatureHof(shingleCol: Column, k: Int = 32): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleCol, sh => xxhash64(lit(j), sh)))
    }: _*)

  /** band hashes: signature split into `bands` rows of length r = k/bands. */
  def bandHashes(sig: Column, k: Int, bands: Int): Column = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands must divide k (got k=$k, bands=$bands): r=0 would hash only the " +
        "band index (every pair collides) and a remainder would silently drop " +
        "signature elements")
    val r = k / bands
    array((0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until r).map(i => element_at(sig, b * r + i + 1)): _*)
    }: _*)
  }

  /** End-to-end candidate-pair pipeline.
    *
    * @param df input with (idCol, textCol)
    * @return (id_a, id_b, jaccard) for pairs whose bands collide and whose
    *         exact shingle-set jaccard ≥ threshold
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 32,
      bands: Int = 8,
      shingleWidth: Int = 3,
      threshold: Double = 0.5): DataFrame =
    // exact-duplicate pre-collapse: LSH + verification run once per
    // DISTINCT text; clone-class pairs re-expand afterwards, bit-identical
    // (see ExactCollapse — on dup-heavy corpora this is the difference
    // between clone-class-quadratic verification and class-count-linear)
    ExactCollapse.pairsByText(df, idCol, textCol, threshold)(reps =>
      pairsOnDistinct(reps, k, bands, shingleWidth, threshold))

  /** The raw pipeline over (id, text) rows assumed pairwise-distinct in
    * text (the collapse wrapper's representatives). */
  private def pairsOnDistinct(
      df: DataFrame,
      k: Int,
      bands: Int,
      shingleWidth: Int,
      threshold: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // cached for ONE materialization of the result (CacheScope releases it
    // after the first action — advice r7): this subtree feeds THREE
    // consumers (two bucket branches + the candidate verification join) —
    // without it the shingle+signature pass, the dominant cost, runs three
    // times (callers looping over many corpora should checkpoint
    // signatures to storage and pass precomputed pairs instead — that is
    // also the 100 TB shape).
    // fanOut BEFORE the signature stage: a dup-heavy corpus compresses to
    // few/one input partitions and would serialize the k-hash signature
    // computation on one core (measured ×11 on the ×30 probe corpus —
    // see graft.pipeline.Parallelism)
    graft.pipeline.CacheScope.withCached(
      // r11 set-mode A/B: even for this signature-heavy stage the sized
      // width (5 at sf0.1) edged out full width 32 (2.11 vs 2.24 s) — the
      // exchange + 32-task scheduling overhead costs more than the extra
      // cores return on a 5 000-doc corpus
      graft.pipeline.Parallelism.fanOut(
          df.select(col("id"), col("text")), col("id"))
        .withColumn("sh", array_distinct(shingles(col("text"), shingleWidth)))
        .withColumn("sig", signature(col("sh"), k))
        .withColumn("bands", bandHashes(col("sig"), k, bands))
    ) { withSig =>

    // explode to (id, bandIdx, bandHash): the LSH bucket key. The self-join
    // shuffles ONLY these slim rows; shingle sets are joined back afterwards
    // for the (much smaller) candidate set.
    val buckets = withSig.select(col("id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))

    val a = buckets.select(col("id").as("id_a"), col("band_idx"), col("band_hash"))
    val b = buckets.select(col("id").as("id_b"), col("band_idx"), col("band_hash"))

    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val shingleSets = withSig.select(col("id"), col("sh"))
    candidates
      .join(shingleSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingleSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }
  }
}
