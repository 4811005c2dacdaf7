package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, GraftFunctions, IvfIndex, IvfPq, PqIndex}

/** Measured recall@10 for the LEARNED ANN structures (IVF, PQ, IVF-PQ) at
  * x1 / x30 / x100 the sf0.1 embeddings corpus — the scale evidence the
  * sign-LSH path already has (LshRecallProbe). The corpus grows with
  * SYNTHETIC same-distribution vectors (near-uniform random like the driver
  * generator — the worst case for any locality structure; real embedding
  * corpora cluster far better, so every bound here is conservative), because
  * replicating identical vectors would plant exact duplicates and overstate
  * recall.
  *
  * Per (scale, structure, config) one JSON line: mean recall@10 over 15
  * queries against brute-force ground truth in the structure's OWN metric
  * (cosine for IVF, exact L2 for PQ / IVF-PQ — ADC approximates L2), plus
  * the honest cost axes (candidate fraction for IVF, build + search wall).
  * Ground-truth L2 ranks via the norm identity ‖a−q‖² = ‖a‖² + ‖q‖² −
  * 2·cos·‖a‖·‖q‖ so the cross join stays on the codegen'd CosineSimilarity
  * kernel (one interpreted norm pass per corpus row, not per pair).
  *
  * Usage: runMain graft.tools.AnnRecallProbe [scales csv, default 1,30,100]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val scales = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 30, 100))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    import spark.implicits._

    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val baseN = real.count()

    // GRAFT_ANN_CORPUS=clustered swaps the near-uniform grow-out for a
    // fully synthetic CLUSTERED corpus: 1024 deterministic centers, each
    // vector = its center + small noise (±0.15 vs centers spanning ±1).
    // Real embedding corpora are clustered — text/image encoders map
    // semantically close inputs close together — so this is the realistic
    // regime, while the uniform corpus (the driver generator's
    // distribution) is the adversarial floor for any locality structure:
    // measured r7–r9, PQ codes CANNOT rank it (recall@10 0.007 at ks=16;
    // re-measured at the standard ks=256 this round — the negative stands,
    // see ANN_RECALL_r10), which is why the shipped queries carry the
    // fidelity-probe fallback. The clustered corpus is where the ADC path
    // must (and does) earn its keep with fallback_engaged=false.
    val corpusMode = sys.env.getOrElse("GRAFT_ANN_CORPUS", "uniform")
    require(corpusMode == "uniform" || corpusMode == "clustered",
      s"GRAFT_ANN_CORPUS='$corpusMode' is not a corpus mode (uniform/clustered)")

    for (scale <- scales) {
      val n = baseN * scale
      val corpus = (corpusMode match {
        case "uniform" =>
          if (scale == 1) real
          else real.unionAll(spark.range(baseN, n).select($"id".as("vec_id"),
            expr("""transform(sequence(0, 63), j ->
                     cast(pmod(xxhash64(id * 64 + j), 2000001) / 1000000.0 - 1.0
                       as float))""").as("embedding")))
        case "clustered" =>
          spark.range(0, n).select($"id".as("vec_id"),
            expr("""transform(sequence(0, 63), j ->
                     cast(pmod(xxhash64(pmod(xxhash64(id), 1024) * 64 + j),
                            2000001) / 1000000.0 - 1.0
                          + 0.15 * (pmod(xxhash64(id * 64 + j + 777),
                              2000001) / 1000000.0 - 1.0)
                       as float))""").as("embedding"))
      }).persist()
      corpus.count()

      val queries = corpus.filter($"vec_id" % (n / 15) === 3)
        .limit(15).select($"vec_id".as("qid"), $"embedding".as("qv"))
        .as[(Long, Array[Float])].collect()

      // one interpreted norm pass per corpus row; pairs stay codegen'd
      val withNorm = corpus.withColumn("na", sqrt(aggregate(
        zip_with($"embedding", $"embedding",
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v))).persist()
      withNorm.count()

      def truthFor(metric: String): Map[Long, Set[Long]] = {
        val q = spark.createDataset(queries.toSeq).toDF("qid", "qv")
          .withColumn("nq", sqrt(aggregate(
            zip_with($"qv", $"qv", (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, v) => acc + v)))
        val crossed = withNorm.crossJoin(broadcast(q))
          .filter($"vec_id" =!= $"qid")
          .withColumn("cos", CosineSimilarity($"embedding", $"qv"))
        val scored = metric match {
          case "cosine" => crossed
            .withColumn("rk", row_number().over(
              Window.partitionBy($"qid").orderBy($"cos".desc_nulls_last, $"vec_id")))
          case "l2" => crossed
            .withColumn("d2", $"na" * $"na" + $"nq" * $"nq" -
              lit(2.0) * coalesce($"cos", lit(0.0)) * $"na" * $"nq")
            .withColumn("rk", row_number().over(
              Window.partitionBy($"qid").orderBy($"d2".asc, $"vec_id")))
        }
        scored.filter($"rk" <= 10).select($"qid", $"vec_id").as[(Long, Long)]
          .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      }
      val truthCos = truthFor("cosine")
      val truthL2 = truthFor("l2")

      def recall(truth: Map[Long, Set[Long]],
          got: Long => Seq[Long]): Double = {
        val rs = queries.map { case (qid, _) =>
          got(qid).filterNot(_ == qid).take(10).toSet
            .intersect(truth(qid)).size / 10.0 }
        rs.sum / rs.length
      }
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      def emit(struct: String, cfg: String, r: Double, buildSec: Double,
          searchSec: Double, extra: String = ""): Unit =
        println(f"""{"scale_x":$scale,"n":$n,"corpus":"$corpusMode",""" +
          f""""structure":"$struct",$cfg,""" +
          f""""recall_at_10":$r%.3f,"build_sec":$buildSec%.1f,""" +
          f""""search_sec_total":$searchSec%.1f$extra}""")

      // ---- IVF: shipped default (k=8, nProbe=3) and a sqrt(n)-scaled k
      val kScaled = math.max(8, math.round(math.sqrt(n.toDouble) / 2).toInt)
      for ((k, probes) <- Seq((8, Seq(3, 5)),
          (kScaled, Seq(math.max(3, kScaled / 8), math.max(5, kScaled / 4))))) {
        val (idx, bSec) = timed(
          IvfIndex.build(spark, corpus, "vec_id", "embedding", k = k,
            iterations = 5))
        for (nProbe <- probes) {
          val byQ = scala.collection.mutable.Map.empty[Long, Seq[Long]]
          val (_, sSec) = timed {
            queries.foreach { case (qid, qv) =>
              byQ(qid) = idx.search(spark, qv, topK = 11, nProbe = nProbe)
                .select($"id").as[Long].collect().toSeq
            }
          }
          emit("ivf", s""""k":$k,"nProbe":$nProbe""",
            recall(truthCos, byQ), bSec, sSec,
            f""","candidate_frac":${nProbe.toDouble / k}%.3f""")
        }
        idx.close()
      }

      // ---- PQ (flat; m/ks env-tunable so the probe can answer "does a
      // bigger code rescue recall on a near-uniform corpus"). Default ks
      // follows the engine default to 256 (the TPAMI 2011 8-bit setting).
      val pqM = sys.env.get("GRAFT_PQ_M").map(_.toInt).getOrElse(8)
      val pqKs = sys.env.get("GRAFT_PQ_KS").map(_.toInt).getOrElse(256)
      val (cb, pqBuildSec) = timed(
        PqIndex.train(spark, corpus, "vec_id", "embedding", m = pqM, ks = pqKs))
      val encoded = PqIndex.encode(corpus, "vec_id", "embedding", cb).persist()
      encoded.count()
      val adcByQ = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      val (_, adcSec) = timed {
        queries.foreach { case (qid, qv) =>
          adcByQ(qid) = PqIndex.search(encoded, qv, cb, topK = 11)
            .select($"id").as[Long].collect().toSeq
        }
      }
      emit("pq_adc", s""""m":$pqM,"ks":$pqKs""", recall(truthL2, adcByQ),
        pqBuildSec, adcSec)
      val rrByQ = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      val (_, rrSec) = timed {
        queries.foreach { case (qid, qv) =>
          rrByQ(qid) = PqIndex.searchRerank(encoded, corpus, "vec_id",
            "embedding", qv, cb, topK = 11, oversample = 10)
            .select($"id").as[Long].collect().toSeq
        }
      }
      emit("pq_rerank", s""""m":$pqM,"ks":$pqKs,"oversample":10""",
        recall(truthL2, rrByQ), pqBuildSec, rrSec)

      // ---- GUARDED defaults (r10, verdict r9 #1): the corpus-density
      // measured-recall gate + fallback the shipped ann_pq_topk /
      // ann_ivfpq_topk queries use, measured end-to-end. Uniform corpus:
      // the gate should fail and the IVF-flat fallback engage; clustered:
      // the ADC+rerank path should serve with the fallback DISENGAGED.
      val pqFidelity = PqIndex.measuredRecall(corpus, "vec_id", "embedding",
        (qv, qid) => PqIndex.searchRerank(
          encoded.filter($"id" =!= qid), corpus, "vec_id", "embedding",
          qv, cb, topK = 10))
      val (ivfFb, fbBuildSec) = timed(IvfIndex.build(
        spark, corpus, "vec_id", "embedding", k = 8, iterations = 5))
      val gByQ = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      val (_, gSec) = timed {
        queries.foreach { case (qid, qv) =>
          gByQ(qid) =
            (if (pqFidelity >= 0.7)
              PqIndex.searchRerank(encoded, corpus, "vec_id", "embedding",
                qv, cb, topK = 11)
            else ivfFb.searchFlatL2(spark, qv, topK = 11, nProbe = 5))
            .select($"id").as[Long].collect().toSeq
        }
      }
      emit("pq_guarded", s""""m":$pqM,"ks":$pqKs""", recall(truthL2, gByQ),
        pqBuildSec + fbBuildSec, gSec,
        f""","probe_fidelity":$pqFidelity%.3f,""" +
          s""""fallback_engaged":${pqFidelity < 0.7}""")
      ivfFb.close()
      encoded.unpersist()

      // ---- IVF-PQ: shipped default (kCoarse=8, nProbe=3) + scaled coarse
      for ((kc, nProbe) <- Seq((8, 3),
          (kScaled, math.max(3, kScaled / 8)))) {
        val (ivfpq, bSec) = timed(IvfPq.build(spark, corpus, "vec_id",
          "embedding", kCoarse = kc, m = pqM, ks = pqKs))
        val byQ = scala.collection.mutable.Map.empty[Long, Seq[Long]]
        val (_, sSec) = timed {
          queries.foreach { case (qid, qv) =>
            byQ(qid) = ivfpq.search(qv, topK = 11, nProbe = nProbe)
              .select($"id").as[Long].collect().toSeq
          }
        }
        emit("ivfpq", s""""kCoarse":$kc,"m":$pqM,"ks":$pqKs,"nProbe":$nProbe""",
          recall(truthL2, byQ), bSec, sSec)
        // IVFADC+R — the shipped query's ADC path since r10 (bare
        // residual-ADC cannot rank dense neighborhoods; the exact rerank
        // of the shortlist recovers it)
        val rByQ = scala.collection.mutable.Map.empty[Long, Seq[Long]]
        val (_, rSec) = timed {
          queries.foreach { case (qid, qv) =>
            rByQ(qid) = ivfpq.searchRerank(corpus, "vec_id", "embedding",
              qv, topK = 11, nProbe = nProbe)
              .select($"id").as[Long].collect().toSeq
          }
        }
        emit("ivfpq_rerank",
          s""""kCoarse":$kc,"m":$pqM,"ks":$pqKs,"nProbe":$nProbe,"oversample":30""",
          recall(truthL2, rByQ), bSec, rSec)
        // guarded path (r10): corpus-density measured recall of the served
        // IVFADC+R path gates against the IVF-flat fallback — the shipped
        // query default (the r9 residual-sample probe was density-blind at
        // ks=256: passed 0.525–0.725 against 0.073 actual ADC recall)
        if (kc == 8) {
          val fidelity = PqIndex.measuredRecall(corpus, "vec_id", "embedding",
            (qv, qid) => ivfpq.searchRerank(
              corpus.filter($"vec_id" =!= qid), "vec_id", "embedding",
              qv, topK = 10, nProbe = nProbe))
          // fallback probes 5 like the shipped query (r9: raised from 3 —
          // the r8 ceiling was pruning loss, the scoring is exact L2)
          val fbProbe = 5
          val gQ = scala.collection.mutable.Map.empty[Long, Seq[Long]]
          val (_, gsSec) = timed {
            queries.foreach { case (qid, qv) =>
              gQ(qid) =
                (if (fidelity >= 0.7)
                  ivfpq.searchRerank(corpus, "vec_id", "embedding", qv,
                    topK = 11, nProbe = nProbe)
                else ivfpq.searchFlat(corpus, "vec_id", "embedding", qv,
                  topK = 11, nProbe = fbProbe))
                .select($"id").as[Long].collect().toSeq
            }
          }
          emit("ivfpq_guarded",
            s""""kCoarse":$kc,"m":$pqM,"ks":$pqKs,"nProbe":${
              if (fidelity >= 0.7) nProbe else fbProbe}""",
            recall(truthL2, gQ), bSec, gsSec,
            f""","probe_fidelity":$fidelity%.3f,""" +
              s""""fallback_engaged":${fidelity < 0.7}""")
        }
        ivfpq.close()
      }

      withNorm.unpersist(); corpus.unpersist()
    }
    spark.stop()
  }
}
