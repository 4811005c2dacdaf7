package graft

import org.apache.spark.sql.functions._

import graft.functions.PqIndex

/** [EXT] Product-quantization semantics: code-range/shape laws,
  * deterministic training, the planted-duplicate rank-1 guarantee, and a
  * measured recall floor vs exact L2 on real data.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")

  test("codes are m ints in [0, ks); training is deterministic") {
    val cb1 = PqIndex.train(spark, emb, "vec_id", "embedding", m = 8, ks = 16,
      iterations = 2)
    val cb2 = PqIndex.train(spark, emb, "vec_id", "embedding", m = 8, ks = 16,
      iterations = 2)
    assert(cb1.codebook.flatten.flatten.toSeq == cb2.codebook.flatten.flatten.toSeq)
    assert(cb1.m == 8 && cb1.ks == 16 && cb1.subDim == 8)

    val codes = PqIndex.encode(emb, "vec_id", "embedding", cb1)
    val bad = codes.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.count() == 0)
  }

  test("planted exact duplicate of the query is rank 1 with distance 0") {
    val cb = PqIndex.train(spark, emb, "vec_id", "embedding", m = 8, ks = 16,
      iterations = 2)
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    // the duplicate IS vec 7 itself: identical vector ⇒ identical codes ⇒
    // every ADC table lookup hits the query's own cell ⇒ the minimum
    val codes = PqIndex.encode(emb, "vec_id", "embedding", cb)
    val top = PqIndex.search(codes, q, cb, topK = 1).head
    assert(top.getLong(0) == 7L)
    // self-distance = sum of the query's own table cells — the global
    // minimum of the ADC metric, shared by any row with the same codes
    val selfDist = top.getDouble(1)
    val better = PqIndex.search(codes, q, cb, topK = 500)
      .filter(col("approx_dist") < selfDist)
    assert(better.count() == 0)
  }

  test("recall@10 vs exact L2 clears the floor on sf0.001") {
    val cb = PqIndex.train(spark, emb, "vec_id", "embedding", m = 8, ks = 16,
      iterations = 4)
    val codes = PqIndex.encode(emb, "vec_id", "embedding", cb).persist()
    codes.count()
    val queries = emb.filter(col("vec_id") < 5).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val recalls = queries.map { case (qid, q) =>
      val truth = emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"),
          aggregate(zip_with(col("embedding"), typedlit(q),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
            lit(0.0), (a, x) => a + x).as("d"))
        .orderBy(col("d").asc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val got = PqIndex.search(codes.filter(col("id") =!= qid), q, cb, 10)
        .collect().map(_.getLong(0)).toSet
      (truth & got).size.toDouble / 10
    }
    codes.unpersist()
    val mean = recalls.sum / recalls.length
    info(f"PQ m=8 ks=16 mean recall@10 over 5 queries: $mean%.2f")
    // near-uniform 64-dim corpus is PQ's worst case (no cluster structure
    // for the codebooks to exploit); measured 0.30 locally. The floor is a
    // collapse detector, not a quality claim — production accuracy comes
    // from ADC-shortlist + exact re-rank (the paper's IVFADC+R pattern)
    assert(mean >= 0.25, f"PQ recall collapsed: $mean%.2f")
  }

  test("adc_distance kernel: hand-computed sum, out-of-range code → null, SQL form") {
    graft.functions.GraftFunctions.register(spark)
    val table = Array(Array(1.0, 2.0), Array(10.0, 20.0), Array(100.0, 200.0))
    val df = Seq(
      (1L, Array(0, 1, 1)),  // 1 + 20 + 200 = 221
      (2L, Array(1, 0, 0)),  // 2 + 10 + 100 = 112
      (3L, Array(0, 5, 0))   // 5 out of range → null
    ).toDF("id", "codes")
    val got = df.select($"id",
        call_function("adc_distance", $"codes", typedlit(table)).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(got(1L) == 221.0 && got(2L) == 112.0 && got(3L) == null)
    // registered for SQL users too
    df.createOrReplaceTempView("adc_t")
    val viaSql = spark.sql(
      "SELECT adc_distance(codes, array(array(1.0D, 2.0D), array(10.0D, 20.0D), " +
        "array(100.0D, 200.0D))) FROM adc_t WHERE id = 1").head.getDouble(0)
    assert(viaSql == 221.0)

    // null ELEMENTS are corrupted input: null, not a wrong sum or an NPE
    val nullCode = spark.sql(
      "SELECT adc_distance(array(0, CAST(NULL AS INT)), " +
        "array(array(1.0D), array(2.0D)))")
    assert(nullCode.head.isNullAt(0))
    val nullRow = spark.sql(
      "SELECT adc_distance(array(0), array(CAST(NULL AS ARRAY<DOUBLE>)))")
    assert(nullRow.head.isNullAt(0))
    val nullCell = spark.sql(
      "SELECT adc_distance(array(0), array(array(CAST(NULL AS DOUBLE))))")
    assert(nullCell.head.isNullAt(0))
  }

  test("measuredRecall: corpus-density gate contract — exact closure scores " +
      "1, an inverted closure scores 0, a too-small corpus fails CLOSED") {
    // the r10 query guard (the sampled probe was measured density-blind at
    // ks=256: passed 0.65 on a corpus the codes rank at 0.2) — pin the
    // gate's own semantics with closures whose recall is known a priori
    def exactSearch(qv: Array[Float], qid: Long) = {
      val qLit = typedlit(qv)
      emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id").as("id"),
          aggregate(zip_with(col("embedding"), qLit,
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
            lit(0.0), (a, x) => a + x).as("d"))
        .orderBy(col("d").asc, col("id"))
    }
    assert(PqIndex.measuredRecall(emb, "vec_id", "embedding",
      (qv, qid) => exactSearch(qv, qid), nQueries = 2) == 1.0)
    // farthest-first: disjoint from the true top-10 on any non-degenerate
    // corpus → 0.0
    assert(PqIndex.measuredRecall(emb, "vec_id", "embedding",
      (qv, qid) => exactSearch(qv, qid).orderBy(col("d").desc, col("id")),
      nQueries = 2) == 0.0)
    // fail closed: a corpus too small to rank meaningfully must engage the
    // fallback, not vouch for the index
    assert(PqIndex.measuredRecall(emb.limit(15), "vec_id", "embedding",
      (qv, qid) => exactSearch(qv, qid), nQueries = 2, topK = 10) == 0.0)
  }

  test("exact re-rank of the ADC shortlist recovers near-perfect recall") {
    val cb = PqIndex.train(spark, emb, "vec_id", "embedding", m = 8, ks = 16,
      iterations = 4)
    val codes = PqIndex.encode(emb, "vec_id", "embedding", cb).persist()
    codes.count()
    val queries = emb.filter(col("vec_id") < 5).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val recalls = queries.map { case (qid, q) =>
      val truth = emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"),
          aggregate(zip_with(col("embedding"), typedlit(q),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
            lit(0.0), (a, x) => a + x).as("d"))
        .orderBy(col("d").asc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val got = PqIndex.searchRerank(codes.filter(col("id") =!= qid),
          emb.filter(col("vec_id") =!= qid), "vec_id", "embedding", q, cb,
          topK = 10, oversample = 20)
        .collect().map(_.getLong(0)).toSet
      (truth & got).size.toDouble / 10
    }
    codes.unpersist()
    val mean = recalls.sum / recalls.length
    info(f"PQ+rerank (oversample=20) mean recall@10: $mean%.2f")
    // 200-candidate shortlist out of 500 on the uniform worst case: the
    // exact re-rank should recover most of the true top-10
    assert(mean >= 0.7, f"rerank recall too low: $mean%.2f")
  }

  // ---- the r8 default guard: sampledRecall separates corpora PQ codes can
  // rank from corpora they can't, and the IVF-flat fallback clears the 0.5
  // recall floor exactly where ADC collapses (verdict r7 #2).
  private def uniformCorpus(n: Int) = spark.range(0, n)
    .select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
               cast(pmod(xxhash64(id * 64 + j), 2000001) / 1000000.0 - 1.0
                 as float))""").as("embedding"))

  test("fidelity probe FAILS on near-uniform vectors and the IVF-flat fallback clears recall 0.5") {
    val uni = uniformCorpus(2000).persist()
    try {
      val cb = PqIndex.train(spark, uni, "vec_id", "embedding", m = 8,
        ks = 16, iterations = 4)
      val sample = PqIndex.collectSample(uni, "vec_id", "embedding", 2000)
      val fid = PqIndex.sampledRecall(sample, cb)
      info(f"probe fidelity on 2000 uniform vectors: $fid%.3f")
      assert(fid < 0.5, f"probe should fail on uniform data, got $fid%.2f")

      // the fallback the query takes: IVF-flat (L2 probes + exact L2)
      val ivf = graft.functions.IvfIndex.build(spark, uni, "vec_id",
        "embedding", k = 8, iterations = 5)
      try {
        val queries = uni.filter(col("vec_id") < 5)
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
        val recalls = queries.map { case (qid, q) =>
          val truth = uni.filter(col("vec_id") =!= qid)
            .select(col("vec_id"),
              aggregate(zip_with(col("embedding"), typedlit(q),
                (x, y) => (x.cast("double") - y.cast("double")) *
                  (x.cast("double") - y.cast("double"))),
                lit(0.0), (a, x) => a + x).as("d"))
            .orderBy(col("d").asc, col("vec_id")).limit(10)
            .collect().map(_.getLong(0)).toSet
          val got = ivf.searchFlatL2(spark, q, topK = 11, nProbe = 5)
            .filter(col("id") =!= qid).limit(10)
            .collect().map(_.getLong(0)).toSet
          (truth & got).size.toDouble / 10
        }
        val mean = recalls.sum / recalls.length
        info(f"IVF-flat fallback recall@10 on the probe-failing corpus: $mean%.2f")
        assert(mean >= 0.5, f"fallback recall below the r8 gate: $mean%.2f")
      } finally ivf.close()
    } finally uni.unpersist()
  }

  test("fidelity probe PASSES where codes rank exactly (discrete per-subspace patterns)") {
    // each 8-dim subvector is one of 16 discrete patterns → k-means(ks=16)
    // recovers them with zero quantization error → ADC distance IS the
    // exact distance and the probe must report (near-)perfect fidelity
    val clustered = spark.range(0, 2000)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 63), j ->
                 cast(pmod(xxhash64(pmod(xxhash64(id * 8 + cast(j / 8 as long)), 16)
                       * 64 + j), 1001) / 100.0 as float))""").as("embedding"))
      .persist()
    try {
      val cb = PqIndex.train(spark, clustered, "vec_id", "embedding", m = 8,
        ks = 16, iterations = 4)
      val sample = PqIndex.collectSample(clustered, "vec_id", "embedding", 2000)
      val fid = PqIndex.sampledRecall(sample, cb)
      info(f"probe fidelity on the discrete-pattern corpus: $fid%.3f")
      assert(fid >= 0.5, f"probe should pass on code-rankable data, got $fid%.2f")
    } finally clustered.unpersist()
  }
}
