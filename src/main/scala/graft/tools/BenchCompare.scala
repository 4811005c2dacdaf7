package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-comparison bench (SURVEY §7 step 8): approx vs exact distinct, and
  * explicit pre-repartition vs letting the aggregation shuffle — prints one
  * JSON line per variant. Decision input for which defaults the engine keeps.
  *
  * Usage: runMain graft.tools.BenchCompare [sfDir] [variant,variant,...]
  * (the optional second argument selects variants; setup for unselected
  * variants is lazy and never runs)
  */
object BenchCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def events = graft.queries.Tables.t(spark, sfDir, "events")
    def li = graft.queries.Tables.t(spark, sfDir, "lineitem")
    graft.functions.GraftFunctions.register(spark)
    // replicate documents x40 (~20k docs) so per-doc text costs dominate
    lazy val docs = {
      val d = graft.queries.Tables.t(spark, sfDir, "documents")
        .crossJoin(spark.range(40)).select(col("doc_id"), col("text")).cache()
      d.count(); d
    }

    // simhash near-dup corpora: ids remapped per copy so replicated texts are
    // distinct docs — every 40-copy group is a planted exact-dup cluster, so
    // the 200k corpus's TRUE pair count is ~5000·C(40,2) ≈ 3.9M: the banded
    // run does real quadratic-in-group work that all-pairs (20B comparisons
    // at 200k docs) could never attempt. 2k subset for the all-pairs side
    lazy val shDocs = {
      val d = graft.queries.Tables.t(spark, sfDir, "documents")
        .crossJoin(spark.range(40).withColumnRenamed("id", "__c"))
        .select((col("doc_id") + col("__c") * 1000000L).as("id"),
          graft.functions.TextFunctions.simhash(col("text")).as("sh")).cache()
      d.count(); d
    }
    lazy val shSmall = {
      val d = shDocs.filter(col("id") % 1000000L < 500 && col("id") < 4000000L).cache()
      d.count(); d // 2000 docs
    }

    // zone-map benefit: a RAW (rollup=false) Day-segmented store — rows per
    // segment stay high, so scan savings are visible — whose extra dim is
    // perfectly time-correlated (one value per segment), the selective-dim
    // best case. Both variants compute the same filtered aggregate; the
    // pruned one restricts the scan to zone-map-admitted segment dirs first.
    val zmPath = java.nio.file.Files.createTempDirectory("graft-zm-bench").toString + "/store"
    val zmSpec = graft.config.IngestionSpec(graft.config.DataSchema("events",
      graft.config.TimestampSpec("ts"),
      graft.config.SpecificDimensions(Seq("daydim", "event_type")),
      Seq(graft.config.AggregatorSpec("doubleSum", "v", Some("value"))),
      graft.config.GranularitySpec(graft.time.Granularity.Day,
        graft.time.Granularity.None, rollup = false)),
      graft.config.Tuning(windowPeriod = java.time.Duration.ofDays(3650), partitions = 8))
    lazy val zmReady: String = {
      val zmPipe = new graft.pipeline.Pipeline(zmSpec)
      val zmIn = events.withColumn("daydim", concat(lit("d"), dayofmonth(col("ts"))))
      graft.sink.SegmentSink.writeBatch(
        zmPipe.rollup(zmPipe.project(zmPipe.extractTimestamp(zmIn))), zmPath)
      zmPath
    }

    // skewed join corpus: ~20M fact rows, 90% on one key (x33 lineitem —
    // below ~10M the fixed scan/shuffle cost drowns the single-reducer tail
    // on 32 local threads; at 100 TB the same shape is an OOM/spill, so the
    // local ratio understates the win)
    lazy val skewFact = {
      val d = li.crossJoin(spark.range(33))
        .select(
          when(pmod(xxhash64(col("l_orderkey"), col("l_partkey"), col("id")),
            lit(10)) < 9, lit(0L))
            .otherwise(pmod(col("l_orderkey"), lit(1000))).as("k"),
          col("l_quantity").as("q")).cache()
      d.count(); d
    }
    lazy val skewDim = {
      val d = spark.range(1000)
        .select(col("id").as("k"), (col("id") * 7).cast("double").as("w")).cache()
      d.count(); d
    }

    // 100k-entry lookup for the two-regime LOOKUP() comparison (> the 10k
    // inline threshold, so the registered path compiles to LookupValue)
    val lkMap: Map[String, String] =
      (0 until 100000).map(i => i.toString -> s"seg_${i % 64}").toMap
    graft.queries.Lookups.register("bench_lk", lkMap)

    def deconShingles: DataFrame =
      graft.queries.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"),
          explode(graft.functions.MinHash.strictShingles(col("text"), 5)).as("s"))

    // ANN scan-cost ladder over a 50k-vector corpus (500 × 100 copies, ids
    // remapped): float brute force vs PQ ADC code-table scan vs IVFADC
    // probing 2 of 16 clusters. Indices are built ONCE here — the variants
    // time the search scan, which is what repeats per query in production
    lazy val vecs = {
      val d = graft.queries.Tables.t(spark, sfDir, "embeddings")
        .crossJoin(spark.range(100).withColumnRenamed("id", "__c"))
        .select((col("vec_id") + col("__c") * 1000000L).as("vec_id"),
          col("embedding")).cache()
      d.count(); d
    }
    lazy val annQuery = graft.queries.Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding"))
      .collect().head.getSeq[Float](0).toArray
    lazy val pqCb = graft.functions.PqIndex.train(spark, vecs, "vec_id", "embedding",
      m = 8, ks = 16, iterations = 2)
    lazy val pqCodes = {
      val d = graft.functions.PqIndex
        .encode(vecs, "vec_id", "embedding", pqCb).cache()
      d.count(); d
    }
    lazy val ivfpq = graft.functions.IvfPq.build(spark, vecs, "vec_id", "embedding",
      kCoarse = 16, m = 8, ks = 16, iterations = 2)

    // persisted-index lifecycle (AnnIndexStore): search over a store-LOADED
    // index vs retraining per query — the round-3 audit's production-shape
    // delta, measured
    lazy val pqLoaded = {
      val annStorePath = java.nio.file.Files
        .createTempDirectory("graft-ann-bench").toString + "/pq"
      graft.sink.AnnIndexStore.savePq(annStorePath, pqCb, pqCodes)
      val l = graft.sink.AnnIndexStore.loadPq(spark, annStorePath)
      l.encoded.count() // materialize the load once — query-many shape
      l
    }

    // bucketed co-located fact⋈fact join (the §2.10 storage lever,
    // BucketingSpec's plan proof measured at sf0.1 volume): lineitem ⋈
    // orders on the order key, broadcast disabled so the join is SMJ both
    // ways; the bucketed layout pre-paid the shuffle at write time
    lazy val bktReady: Unit = {
      val bktDb = java.nio.file.Files.createTempDirectory("graft-bkt").toString
      li.write.mode("overwrite").bucketBy(cpus.toInt, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$bktDb/li_b").saveAsTable("li_b")
      graft.queries.Tables.t(spark, sfDir, "orders")
        .write.mode("overwrite").bucketBy(cpus.toInt, "o_orderkey")
        .sortBy("o_orderkey").option("path", s"$bktDb/o_b").saveAsTable("o_b")
    }

    // bucketed SEGMENT STORE (r6 compactBucketed/readBucketed — the at-rest
    // half of §2.10): the same day×user rollup compacted twice, joined on
    // the bucket dim through plain parquet reads (both sides shuffle) vs
    // the catalog-attached bucket layout (zero join exchanges)
    lazy val bstReady: (String, String) = {
      val db = java.nio.file.Files.createTempDirectory("graft-bstore").toString
      val spec = graft.config.IngestionSpec(graft.config.DataSchema("ev",
        graft.config.TimestampSpec("ts"),
        graft.config.SpecificDimensions(Seq("user_id_s")),
        Seq(graft.config.AggregatorSpec("count", "cnt"),
          graft.config.AggregatorSpec("doubleSum", "v", Some("value"))),
        graft.config.GranularitySpec(graft.time.Granularity.Month,
          graft.time.Granularity.Day)))
      val pipe = new graft.pipeline.Pipeline(spec)
      val in = events.withColumn("user_id_s", col("user_id").cast("string"))
      graft.sink.SegmentSink.writeBatch(pipe.withSegment(
        pipe.rollup(pipe.project(pipe.extractTimestamp(in)))), s"$db/raw")
      graft.sink.SegmentStore.compactBucketed(spark, s"$db/raw", spec,
        s"$db/bktA", "bench_bkt_a", Seq("user_id_s"), 8)
      graft.sink.SegmentStore.compactBucketed(spark, s"$db/raw", spec,
        s"$db/bktB", "bench_bkt_b", Seq("user_id_s"), 8)
      (s"$db/bktA", s"$db/bktB")
    }

    // tuple-sketch comparison corpus: events ×10 with per-copy user
    // remapping (10× the distinct-user keyspace — the dimension that
    // hurts the exact plan)
    lazy val bigEvents = {
      val d = events.crossJoin(spark.range(10).withColumnRenamed("id", "__c"))
        .select((col("user_id") + col("__c") * 10000000L).as("user_id"),
          col("event_type"), col("value")).cache()
      d.count(); d
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      // "distinct users AND their summed spend per group": the exact plan
      // needs a user-keyed intermediate (keyspace = groups × users — the
      // shuffle that explodes at 100 TB); the ArrayOfDoubles tuple sketch
      // is ONE bounded-state pass (k retained keys per group) whose
      // partials also re-merge from storage without re-reading raw data
      "tuple_exact_two_pass_x10" -> (() => bigEvents
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value")).as("sv"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("uniq"), sum(col("sv")).as("spend"))),
      "tuple_sketch_one_pass_x10" -> (() => bigEvents
        .groupBy(col("event_type"))
        .agg(call_function("tuple_sketch_agg",
          col("user_id").cast("string"),
          array(col("value").cast("double")), lit(4096)).as("sk"))
        .select(col("event_type"),
          call_function("tuple_estimate", col("sk")).as("uniq"),
          call_function("tuple_metrics_sum", col("sk")).as("spend"))),
      "fact_join_plain_parquet" -> (() => {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li.join(graft.queries.Tables.t(spark, sfDir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity")), count(lit(1)))
      }),
      "fact_join_bucketed" -> (() => {
        bktReady
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.table("li_b").join(spark.table("o_b"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity")), count(lit(1)))
      }),
      // per-user aggregate of each store, joined on the user dim — the
      // repeated-workload shape the layout amortizes: on the bucketed read
      // BOTH groupBys and the join run exchange-free; the plain read of
      // the SAME files shuffles each side
      "store_join_plain_read" -> (() => {
        bstReady
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.read.parquet(bstReady._1)
          .groupBy(col("user_id_s")).agg(sum(col("cnt")).as("ca"))
          .join(spark.read.parquet(bstReady._2)
            .groupBy(col("user_id_s")).agg(sum(col("v")).as("vb")), "user_id_s")
          .select(sum(col("ca") * col("vb")))
      }),
      "store_join_bucketed_read" -> (() => {
        bstReady
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        graft.sink.SegmentStore.readBucketed(spark, bstReady._1, "bench_bkt_a")
          .groupBy(col("user_id_s")).agg(sum(col("cnt")).as("ca"))
          .join(graft.sink.SegmentStore
            .readBucketed(spark, bstReady._2, "bench_bkt_b")
            .groupBy(col("user_id_s")).agg(sum(col("v")).as("vb")), "user_id_s")
          .select(sum(col("ca") * col("vb")))
      }),
      "ann_brute_50k" -> (() => {
        val q = org.apache.spark.sql.functions.typedlit(annQuery)
        vecs.withColumn("cos",
            graft.functions.CosineSimilarity(col("embedding"), q))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
      }),
      "ann_pq_adc_50k" -> (() =>
        graft.functions.PqIndex.search(pqCodes, annQuery, pqCb, topK = 10)),
      "ann_ivfpq_probe2_50k" -> (() =>
        ivfpq.search(annQuery, topK = 10, nProbe = 2)),
      "ann_pq_rebuild_per_query_50k" -> (() => {
        val cb = graft.functions.PqIndex.train(spark, vecs, "vec_id",
          "embedding", m = 8, ks = 16, iterations = 2)
        val codes = graft.functions.PqIndex.encode(vecs, "vec_id", "embedding", cb)
        graft.functions.PqIndex.search(codes, annQuery, cb, topK = 10)
      }),
      "ann_pq_loaded_search_50k" -> (() =>
        graft.functions.PqIndex.search(pqLoaded.encoded, annQuery,
          pqLoaded.cb, topK = 10)),
      "simhash_nd_allpairs_2k" -> (() => {
        val a = shSmall.select(col("id").as("id_a"), col("sh").as("sh_a"))
        val b = shSmall.select(col("id").as("id_b"), col("sh").as("sh_b"))
        a.join(b, col("id_a") < col("id_b"))
          .filter(graft.functions.TextFunctions
            .hammingDistance(col("sh_a"), col("sh_b")) <= 3)
      }),
      "simhash_nd_banded_2k" -> (() => graft.functions.SimHashLsh
        .nearDupsFromFingerprints(shSmall, "id", "sh", maxHamming = 3, bands = 4)),
      "simhash_nd_banded_200k" -> (() => graft.functions.SimHashLsh
        .nearDupsFromFingerprints(shDocs, "id", "sh", maxHamming = 3, bands = 4)),
      "zonemap_full_scan" -> (() => spark.read.parquet(zmReady)
        .filter(col("daydim") === "d5").groupBy(col("event_type"))
        .agg(sum(col("value")))),
      "zonemap_pruned" -> (() => {
        val segs = graft.sink.SegmentStore.pruneSegments(spark, zmReady, "daydim", "d5")
        spark.read.parquet(zmReady)
          .filter(col(graft.pipeline.Pipeline.SegmentCol).isin(segs: _*) &&
            col("daydim") === "d5")
          .groupBy(col("event_type")).agg(sum(col("value")))
      }),
      "distinct_exact" -> (() => events
        .groupBy(date_trunc("day", col("ts")), col("event_type"))
        .agg(count_distinct(col("user_id")))),
      "distinct_approx" -> (() => events
        .groupBy(date_trunc("day", col("ts")), col("event_type"))
        .agg(approx_count_distinct(col("user_id")))),
      "agg_direct" -> (() => li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")))),
      "agg_prerepartitioned" -> (() => graft.pipeline.Partitioners
        .repartitionByHash(li, cpus.toInt, Seq(col("l_returnflag"), col("l_linestatus")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")))),
      "ivf_build_sf" -> (() => {
        // build-time guard for the persisted seeding frame (r3: `hashed`
        // cached across farthest-first + Lloyd passes; r2 re-read the source
        // k+2·iterations times). Each run leaks one small persisted frame —
        // bench tool only, sized k·dim driver state
        graft.functions.IvfIndex.build(spark,
          spark.read.parquet(s"$sfDir/embeddings.parquet"),
          "vec_id", "embedding", k = 8, iterations = 5).indexed
      }),
      "simhash_native" -> (() => docs
        .select(graft.functions.TextFunctions.simhash(col("text")).as("h"))
        .groupBy().agg(count_distinct(col("h")))),
      "simhash_hof" -> (() => docs
        .select(graft.functions.TextFunctions.simhashHof(col("text")).as("h"))
        .groupBy().agg(count_distinct(col("h")))),
      // -- decontamination: exact broadcast anti-join vs Bloom prefilter.
      // Locally the exact set broadcasts fine, so bloom pays an extra build
      // pass; the bloom shape exists for benchmark sets too big to
      // broadcast raw (GBs of shingles vs a 128 KB filter) — this measures
      // the local-regime cost of that insurance, honestly ------------------
      "decon_exact_broadcast" -> (() => {
        val sh = deconShingles
        val bench = sh.filter(col("doc_id") % 100 === 0).select(col("s")).distinct()
        val bad = sh.filter(col("doc_id") % 100 =!= 0)
          .join(broadcast(bench), Seq("s")).select(col("doc_id")).distinct()
        graft.queries.Tables.t(spark, sfDir, "documents")
          .filter(col("doc_id") % 100 =!= 0)
          .join(bad, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)))
      }),
      "decon_bloom_prefilter" -> (() => {
        val sh = deconShingles
        val bench = sh.filter(col("doc_id") % 100 === 0).select(col("s")).distinct()
        val bloom = bench
          .agg(call_function("bloom_agg", col("s"), lit(1 << 20), lit(7)).as("b"))
          .head().getAs[Array[Byte]](0)
        val cand = sh.filter(col("doc_id") % 100 =!= 0)
          .filter(call_function("bloom_might_contain", lit(bloom), col("s")))
        val bad = cand.join(broadcast(bench), Seq("s")).select(col("doc_id")).distinct()
        graft.queries.Tables.t(spark, sfDir, "documents")
          .filter(col("doc_id") % 100 =!= 0)
          .join(bad, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)))
      }),
      // -- two-regime LOOKUP() at 100k entries: the inline CreateMap
      // literal (what a naive LOOKUP() builds — O(n) ElementAt probe over
      // an array-backed literal, plus a ~3 MB expression tree re-analyzed
      // and shipped in every task binary) vs the registered broadcast
      // LookupValue probe (codegen'd O(1) HashMap hit, bits ship once).
      // Timings INCLUDE plan construction — that cost is the point. The
      // inline side probes a 10k-row slice: its O(rows × entries) scan is
      // so far gone (~10¹¹ compares at 1M rows — hours) that the full
      // table would never finish; same 10k slice on the broadcast side
      // keeps the pair apples-to-apples, and a third row runs the
      // broadcast probe over the FULL table to show the O(1) path at
      // data scale. ------------------------------------------------------
      "lookup_inline_literal_100k_10krows" -> (() => {
        import org.apache.spark.sql.catalyst.expressions.{CreateMap, ElementAt, Literal}
        val entries = lkMap.toSeq.sortBy(_._1)
          .flatMap { case (k, v) => Seq(Literal(k), Literal(v)) }
        val key = org.apache.spark.sql.graft.GraftSqlBridge.expression(
          col("user_id").cast("string"))
        val probe = org.apache.spark.sql.graft.GraftSqlBridge.column(
          ElementAt(CreateMap(entries), key, scala.None, failOnError = false))
        events.filter(col("event_id") < 10000).select(probe.as("lbl"))
          .groupBy(col("lbl")).agg(count(lit(1)))
      }),
      "lookup_broadcast_100k_10krows" -> (() => {
        events.filter(col("event_id") < 10000)
          .select(call_function("lookup",
            col("user_id").cast("string"), lit("bench_lk")).as("lbl"))
          .groupBy(col("lbl")).agg(count(lit(1)))
      }),
      "lookup_broadcast_100k_full" -> (() => {
        events.select(call_function("lookup",
            col("user_id").cast("string"), lit("bench_lk")).as("lbl"))
          .groupBy(col("lbl")).agg(count(lit(1)))
      }),
      // -- skew-join relief: 90%-hot-key fact ⋈ 1k-key dim. These three run
      // LAST: each pins its own AQE state, and both disable auto-broadcast
      // (a broadcast join would sidestep the shuffle being measured — at
      // real scale the dim side is too big/dynamic to broadcast) ------------
      "skew_join_plain_aqe_off" -> (() => {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        skewFact.join(skewDim, Seq("k"))
          .groupBy(col("k")).agg(sum(col("q") * col("w")))
      }),
      "skew_join_salted_aqe_off" -> (() => {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        graft.pipeline.Partitioners.saltedJoin(skewFact, skewDim, "k", cpus.toInt)
          .groupBy(col("k")).agg(sum(col("q") * col("w")))
      }),
      "skew_join_plain_aqe_on" -> (() => {
        // AQE's own skew handling, same join — the adaptive baseline
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        skewFact.join(skewDim, Seq("k"))
          .groupBy(col("k")).agg(sum(col("q") * col("w")))
      }))

    // session defaults between variants (skew variants pin their own state)
    def resetConf(): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    val selected = variants.filter { case (n, _) => only.forall(_(n)) }
    require(selected.nonEmpty, s"no variant matches $only")
    def force(df: org.apache.spark.sql.DataFrame): Unit = Force.noop(df)
    selected.foreach { case (name, f) => resetConf(); force(f()) } // warm-up
    selected.foreach { case (name, f) =>
      resetConf()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(f()); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"variant":"$name","best_sec":${times.min}%.3f,"runs":${times.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    }
    spark.stop()
  }
}
