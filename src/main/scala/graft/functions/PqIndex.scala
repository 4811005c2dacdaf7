package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Product-quantization ANN (Jégou/Douze/Schmid, TPAMI 2011): split
  * each dim-D vector into `m` subvectors, learn a per-subspace k-means
  * codebook (`ks` codes each, default 256 = the paper's 8-bit
  * subquantizer), store every vector as `m` small ints — a 64-dim float
  * vector (256 B) becomes 8 one-byte codes. Search is ADC (asymmetric distance):
  * the query precomputes an m×ks table of exact subspace distances (driver-
  * side, tiny), and each stored vector's approximate L2² is m table lookups
  * — no float math per row at scan time.
  *
  * Spark-first construction mirroring [[IvfIndex]]:
  *  - training explodes (id, vec) to (id, subspace j, subvector) ONCE and
  *    persists it; each Lloyd pass is one distributed argmin (codebook
  *    broadcast as a literal — m·ks·(D/m) doubles, ~1 KB) + one distributed
  *    mean (posexplode → groupBy(j, code, dim)). All m subspaces train in
  *    the SAME pass — m independent k-means with zero extra jobs.
  *  - seeding is deterministic: per subspace, the ks subvectors with the
  *    smallest xxhash64(id) (rank window per j) — reproducible, no RNG.
  *  - encode/search stay in DataFrame expressions (HOF lambdas over the
  *    broadcast codebook/table literals); the only driver-side state is the
  *    codebook and the per-query distance table, both O(m·ks).
  *
  * The distance metric is L2² (the paper's); cosine callers L2-normalize
  * first (then L2² = 2 − 2·cos, rank-equivalent).
  */
final case class PqCodebook(m: Int, ks: Int, subDim: Int,
    codebook: Array[Array[Array[Double]]]) extends Serializable

object PqIndex {

  /** m slices of `vec`, each subDim wide, as array<array<float>>. */
  private[functions] def slices(vec: Column, m: Int, subDim: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      j => slice(vec, j * subDim + 1, lit(subDim)))

  /** Train per-subspace codebooks over (idCol, vecCol: array<float>). Vector
    * length must be divisible by m.
    *
    * ks default is 256 (r10, verdict r9 #1): the standard PQ setting —
    * 8 bits/subquantizer (Jégou et al. TPAMI 2011 §II.C choose ks=256 as
    * the practical operating point); the r9 default of 16 gave each 8-dim
    * subspace only 16 cells and ranked even clustered corpora poorly.
    * Assignment runs through the native `pq_encode` kernel (all m argmins
    * in one codegen'd pass per row), which is what makes 256
    * codewords/subspace affordable — the interpreted HOF argmin the r9
    * code used was m·ks·subDim lambda evals per row.
    */
  def train(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ks: Int = 256, iterations: Int = 4): PqCodebook = {
    GraftFunctions.register(spark)
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val dim = base.select(size(col("vec"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(
        throw new IllegalArgumentException("PqIndex.train: input has no vectors"))
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m

    // deterministic seeds: per subspace the ks smallest-hash subvectors
    val subs = base
      .select(col("id"), posexplode(slices(col("vec"), m, subDim)).as(Seq("j", "sub")))
    val w = Window.partitionBy(col("j")).orderBy(xxhash64(col("id")), col("id"))
    val seedRows = subs.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= ks)
      .select(col("j"), col("__r"), col("sub"))
      .collect()
    var cb: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val forJ = seedRows.filter(_.getInt(0) == j).sortBy(_.getInt(1))
      require(forJ.nonEmpty, s"no vectors to seed subspace $j")
      // fewer distinct vectors than ks: reuse cyclically (duplicate codes
      // are harmless — argmin picks the first)
      Array.tabulate(ks)(c =>
        // float OR double element type (IvfPq trains on double residuals)
        forJ(c % forJ.length).getSeq[Number](2).map(_.doubleValue).toArray)
    }

    for (_ <- 0 until iterations) {
      // assignment on the UNEXPLODED frame — one pq_encode pass per row
      // computes all m codes; the explode to (j, code, dim, x) feeds a
      // codegen'd partial-aggregated mean (m·ks·subDim groups, tiny)
      val assigned = base.withColumn("codes",
        call_function("pq_encode", col("vec"), typedlit(cb)))
      val means = assigned
        .select(col("codes"),
          posexplode(slices(col("vec"), m, subDim)).as(Seq("j", "sub")))
        .select(col("j"),
          element_at(col("codes"), col("j") + 1).as("code"),
          posexplode(col("sub")).as(Seq("dim", "x")))
        .groupBy(col("j"), col("code"), col("dim"))
        .agg(avg(col("x").cast("double")).as("mn"))
        .collect()
      val next = cb.map(_.map(_.clone())) // empty codes keep their centroid
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      cb = next
    }
    PqCodebook(m, ks, subDim, cb)
  }

  /** Encode every vector to its m codes: (id, codes array<int>). At rest
    * this is the stored index — ~m·log2(ks) bits per vector.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).cast("long").as("id"),
      call_function("pq_encode", col(vecCol), typedlit(cb.codebook)).as("codes"))
  }

  /** ADC top-k: approximate L2² = Σ_j table[j][code_j], table exact on the
    * query side. One scan of the code table, TakeOrderedAndProject top-k —
    * no per-row float vector math.
    */
  def search(encoded: DataFrame, query: Array[Float], cb: PqCodebook,
      topK: Int): DataFrame = {
    val dt: Array[Array[Double]] = Array.tabulate(cb.m) { j =>
      Array.tabulate(cb.ks) { c =>
        var s = 0.0; var d = 0
        while (d < cb.subDim) {
          val diff = query(j * cb.subDim + d).toDouble - cb.codebook(j)(c)(d)
          s += diff * diff; d += 1
        }
        s
      }
    }
    // native kernel (adc_distance Expression): the HOF composition
    // (aggregate∘zip_with∘element_at) is an interpreted lambda per subspace
    // per row and measured SLOWER than brute-force cosine at 50k vectors
    GraftFunctions.register(encoded.sparkSession)
    encoded
      .withColumn("approx_dist",
        call_function("adc_distance", col("codes"), typedlit(dt)))
      // nulls LAST: adc_distance yields null for corrupted/missing codes and
      // Spark's asc default is NULLS FIRST — they must not occupy the top-k
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(topK)
      .select(col("id"), round(col("approx_dist"), 6).as("approx_dist"))
  }

  /** ADC shortlist + exact re-rank (the paper's IVFADC+R refinement): the
    * cheap code scan over-fetches `topK · oversample` candidates, then only
    * that sliver joins back to the float vectors for exact L2². The scan
    * cost stays ADC's; the exact math touches O(topK · oversample) rows —
    * this is how PQ recovers exact-ranking quality on corpora where 8-byte
    * codes alone can't separate near-ties.
    */
  def searchRerank(encoded: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, query: Array[Float], cb: PqCodebook, topK: Int,
      oversample: Int = 30): DataFrame = {
    val shortlist = search(encoded, query, cb, topK * oversample)
      .select(col("id"))
    val qLit = typedlit(query)
    vectors
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
      .join(broadcast(shortlist), Seq("id"))
      .withColumn("dist", VectorMath.l2sqCol(col("__v"), qLit))
      .orderBy(col("dist").asc_nulls_last, col("id"))
      .limit(topK)
      .select(col("id"), round(col("dist"), 6).as("dist"))
  }

  /** Deterministic bounded sample of (id, vec) for [[sampledRecall]]: the
    * `n` rows with the smallest xxhash64(id) — arbitrary-but-stable, not
    * biased toward low ids (the IvfIndex seeding sample's rule). */
  def collectSample(df: DataFrame, idCol: String, vecCol: String,
      n: Int): Array[(Long, Array[Double])] =
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .orderBy(xxhash64(col("id")), col("id")).limit(n)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)

  /** Corpus-density fidelity probe (r10, verdict r9 #1): measured recall@k
    * of the SERVED search path against distributed exact-L2 ground truth,
    * over `nQueries` deterministic probe queries at FULL corpus density.
    *
    * Why this supersedes [[sampledRecall]] as the query guard: the sampled
    * probe ranks within a bounded sample, and ranking difficulty is a
    * DENSITY property — at ks=256 a 2000-point sample of the ×100 uniform
    * corpus scores 0.65 (looks fine) while the full 200k-corpus recall of
    * the same codes is 0.200 (measured, ANN_RECALL_r10): the sample's
    * neighbors are ~100× farther apart than the corpus's true top-10, so
    * quantization noise that swamps the real ranking is invisible to it.
    * The only density-correct ground truth is the corpus itself: `search`
    * is the exact closure the query will serve (ADC + rerank, or
    * IVFADC+R), compared to a brute-force exact top-k — a handful of
    * one-time distributed scans, memoized per persisted index
    * (VectorQueries.memoFidelity), i.e. an index-qualification step, not
    * a per-query cost. Fail-closed stance preserved: too small a corpus
    * (≤ 2·topK rows) returns 0 and the caller falls back to exact-path
    * scoring, which is near-free at that size anyway. */
  def measuredRecall(vectors: DataFrame, idCol: String, vecCol: String,
      search: (Array[Float], Long) => DataFrame,
      nQueries: Int = 3, topK: Int = 10): Double = {
    val v = vectors.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    if (v.limit(2 * topK + 1).count() <= 2 * topK) return 0.0
    val qs = collectSample(vectors, idCol, vecCol, nQueries)
    val hits = qs.map { case (qid, qv) =>
      val qf = qv.map(_.toFloat)
      val exact = v.filter(col("id") =!= qid)
        .withColumn("__d", VectorMath.l2sqCol(col("vec"), typedlit(qf)))
        .orderBy(col("__d").asc_nulls_last, col("id"))
        .limit(topK).select(col("id"))
        .collect().map(_.getLong(0)).toSet
      val served = search(qf, qid).select(col("id")).limit(topK)
        .collect().map(_.getLong(0)).toSet
      (exact & served).size.toDouble / topK
    }
    hits.sum / hits.length
  }

  /** Cheap code-fidelity probe (advice/verdict r7 #3). DEMOTED from query
    * guard to diagnostic in r10: a bounded sample measures ranking at
    * SAMPLE density, and at ks=256 that passes (0.65) on a corpus the
    * codes rank at 0.2 — see [[measuredRecall]], which the shipped
    * queries now gate on. Still used by specs as a fast structural signal
    * (it does separate discrete-pattern corpora from uniform ones).
    *
    * Estimated recall@k of ADC ranking vs exact L2 WITHIN a bounded
    * sample, computed entirely
    * on the driver (sample·m·ks encode flops + queries·sample distance
    * evals — ~10⁷ flops at the defaults, microseconds of work, no Spark
    * jobs beyond the sample collect). PQ codes rank near-uniform
    * high-dimensional corpora at catastrophically low recall (measured
    * 0.007–0.2 at ×100 on the synthetic embeddings — ANN_RECALL_r7) while
    * ranking clustered corpora well; this probe tells the two apart at
    * query time so the caller can fall back to IVF-flat instead of
    * returning near-0-recall answers. Self-calibrating: it measures the
    * failure mode itself (ranking fidelity), not a structural proxy with a
    * hand-tuned threshold. Deterministic: fixed sample rule, first
    * `nQueries` sample points as queries, stable tiebreaks. */
  def sampledRecall(sample: Array[(Long, Array[Double])], cb: PqCodebook,
      nQueries: Int = 8, topK: Int = 10): Double = {
    // fail CLOSED (review finding r8): no/too-little evidence must engage
    // the exact-scoring fallback, not vouch for the codes — an empty
    // sample (e.g. a stale cached index whose ids no longer join the
    // corpus) returning 1.0 would re-open the exact footgun this probe
    // exists to close. On genuinely tiny corpora the fallback is
    // near-exact and cheap anyway.
    if (sample.length <= 2 * topK) return 0.0
    // local encode: nearest code per subspace, first-min tiebreak (the
    // encode() expression's semantics)
    def encodeLocal(v: Array[Double]): Array[Int] = Array.tabulate(cb.m) { j =>
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cb.ks) {
        var s = 0.0; var d = 0
        while (d < cb.subDim) {
          val diff = v(j * cb.subDim + d) - cb.codebook(j)(c)(d)
          s += diff * diff; d += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    }
    val codes = sample.map { case (id, v) => (id, encodeLocal(v)) }
    val qs = sample.take(math.min(nQueries, sample.length))
    val hits = qs.map { case (qid, qv) =>
      val adcTable = Array.tabulate(cb.m) { j =>
        Array.tabulate(cb.ks) { c =>
          var s = 0.0; var d = 0
          while (d < cb.subDim) {
            val diff = qv(j * cb.subDim + d) - cb.codebook(j)(c)(d)
            s += diff * diff; d += 1
          }
          s
        }
      }
      val exact = sample.iterator.filter(_._1 != qid)
        .map { case (id, v) => (id, VectorMath.l2sqLocal(qv, v)) }.toArray
        .sortBy { case (id, d) => (d, id) }.take(topK).map(_._1).toSet
      val approx = codes.iterator.filter(_._1 != qid)
        .map { case (id, cs) =>
          var s = 0.0; var j = 0
          while (j < cb.m) { s += adcTable(j)(cs(j)); j += 1 }
          (id, s)
        }.toArray
        .sortBy { case (id, d) => (d, id) }.take(topK).map(_._1).toSet
      (exact & approx).size.toDouble / topK
    }
    hits.sum / hits.length
  }
}
