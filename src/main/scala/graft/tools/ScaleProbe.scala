package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scale check: replicates the sf0.1 fact tables xN into /tmp
  * (lineitem ~6M rows at N=10, events 1M) with remapped keys, then times the
  * headline queries there. The point is not the absolute numbers but the
  * SHAPE: if a plan's runtime grows ~linearly with N while the plan stays
  * scan→broadcast-join→single-shuffle-agg, it will survive the next 100×
  * (SURVEY "would this partition strategy hold at 1000× the data?").
  *
  * Usage: runMain graft.tools.ScaleProbe [N] [baseSf]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val baseSf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_PROBE_TABLES=documents[,events,…] restricts which FACT
    // tables replicate ×N — the rest copy through at ×1 so any query still
    // runs (e.g. a documents-only ×1000 that fits the box). Restricted runs
    // are labeled: the output dir gets a suffix (so a SKIP_GEN reuse can
    // never serve a mixed x1/xN corpus as the full one) and the JSON
    // carries replicated_tables (so an artifact line can't pass x1 numbers
    // off as xN for the unreplicated tables).
    val replTables = sys.env.get("SPARK_GRAFT_PROBE_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    replTables.foreach(s => require(s.nonEmpty,
      "SPARK_GRAFT_PROBE_TABLES is set but empty — it would replicate " +
        "NOTHING; unset it for the full fact set or name tables"))
    // loud on typos (advice r9 #3): 'Documents' would pass the emptiness
    // check, replicate nothing, and label the artifact scale_x=N anyway —
    // the exact mislabeled-benchmark class StateStoreEnv rejects for
    // backend names. Validate against the replicable fact set.
    val knownFacts = Set("lineitem", "orders", "customer", "events", "documents")
    replTables.foreach { s =>
      val unknown = s -- knownFacts
      require(unknown.isEmpty,
        s"SPARK_GRAFT_PROBE_TABLES names unknown fact tables " +
          s"${unknown.toSeq.sorted.mkString("[", ", ", "]")} — replicable " +
          s"facts are ${knownFacts.toSeq.sorted.mkString("[", ", ", "]")} " +
          "(dims always copy through at x1)")
    }
    val outSuffix = replTables.map(s => "-" + s.toSeq.sorted.mkString("_"))
      .getOrElse("")
    val out = s"/tmp/graft-scale-x$n$outSuffix"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // A/B lever: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" sets session confs (e.g.
    // spark.graft.spanDedup.stringGramKey=true for a gram-key A/B against
    // the hashed default)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_EXTRA_CONF segment '$kv' is not k=v")
        }
      })

    // per-query shuffle-write accounting: TASK-level metrics accumulated by
    // a listener (stage-level StageInfo.taskMetrics proved unreliable —
    // measured ~0 for real shuffles), snapshotted around each timed run
    // (warm-ups excluded)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })

    // replicate facts with key remapping so join fan-outs stay realistic;
    // dims stay as-is (they'd be broadcast at any scale)
    def replicate(table: String, keyCols: Seq[String]): Unit = {
      // repartition the SMALL base table BEFORE the crossJoin, not the
      // replicated frame after: a one-file sf0.1 parquet is ONE input
      // split, so the ×N blow-up (and the whole post-blow-up shuffle map
      // side) otherwise runs on ONE core — measured ~4 MB/s of shuffle
      // write for a ×100 gen that then takes an hour (r10; r9 had moved a
      // repartition AFTER the crossJoin, which fixed the output-file
      // count but still paid a full single-threaded shuffle of the BIG
      // frame first). Shuffling the base costs megabytes; each of the 32
      // partitions then replicates and writes its own output file in
      // parallel, and the write needs no second shuffle at all — the
      // multi-file output that per-doc scan parallelism needs falls out
      // of the parallel write (one file per partition).
      val src = graft.queries.Tables.t(spark, baseSf, table)
        .repartition(cpus.toInt)
      val copies = spark.range(n).withColumnRenamed("id", "__copy")
      val big = src.crossJoin(copies)
      val remapped = keyCols.foldLeft(big) { (df, k) =>
        df.withColumn(k, col(k) + col("__copy") * 10000000L)
      }
      remapped.drop("__copy")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    val t0 = System.nanoTime()
    // A/B reruns over the same replicated corpus skip the (dominant)
    // generation cost: SPARK_GRAFT_SKIP_GEN=1 + an existing dir reuses it
    val skipGen = sys.env.get("SPARK_GRAFT_SKIP_GEN").contains("1") &&
      new java.io.File(s"$out/documents.parquet").exists()
    def wants(t: String): Boolean = replTables.forall(_.contains(t))
    if (!skipGen) {
    val facts = Seq(
      "lineitem" -> Seq("l_orderkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "events" -> Seq("event_id"),
      // text corpus scales too (identical bodies per copy — adversarial for
      // the gram/shingle shuffles: every key becomes n× hot)
      "documents" -> Seq("doc_id"))
    facts.foreach { case (t, keys) =>
      if (wants(t)) replicate(t, keys)
      else graft.queries.Tables.t(spark, baseSf, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    Seq("region", "nation", "supplier", "part", "embeddings").foreach { t =>
      graft.queries.Tables.t(spark, baseSf, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    }
    val genSec = (System.nanoTime() - t0) / 1e9

    // 3rd arg: comma-separated query names (default: the bench headliners)
    val qs = args.lift(2) match {
      case Some(names) =>
        val want = names.split(",").toSet
        graft.SparkEntry.registry.filter(q => want(q.name))
      case scala.None => graft.SparkEntry.headlines
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit = Force.noop(df)
    qs.foreach(q => try force(q.run(spark, out)) catch { case _: Throwable => () })
    val results = qs.map { q =>
      val s0 = System.nanoTime()
      val sb0 = shuffleBytes.get()
      val ok = try { force(q.run(spark, out)); true }
               catch { case e: Throwable =>
                 System.err.println(s"[scale] ${q.name} FAILED: ${e.getMessage}"); false }
      // wall time stops HERE — the listener drain below is measurement
      // plumbing, not query cost (advisor finding r8: the ≥500 ms poll was
      // inflating every reported timing)
      val sec = (System.nanoTime() - s0) / 1e9
      // listener events drain async and the bus has no public drain
      // barrier — poll until the counter is stable for two consecutive
      // 250 ms windows (max 3 s) so late task-end events do not
      // misattribute bytes to the next query (review finding r8)
      var last = shuffleBytes.get(); var stable = 0; var waited = 0
      while (stable < 2 && waited < 3000) {
        Thread.sleep(250); waited += 250
        val now = shuffleBytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      val sb = shuffleBytes.get() - sb0
      q.name -> (if (ok) sec else -1.0, sb)
    }
    val qJson = results.map { case (k, (v, _)) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val sJson = results.map { case (k, (_, sb)) => "\"" + k + s"""\":$sb""" }.mkString("{", ",", "}")
    val replJson = replTables
      .map(s => s.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]"))
      .getOrElse("\"all_facts\"")
    println(f"""{"scale_x":$n,"replicated_tables":$replJson,"gen_sec":$genSec%.1f,"total_sec":${results.map(_._2._1).sum}%.3f,"queries":$qJson,"shuffle_write_bytes":$sJson}""")
    spark.stop()
  }
}
