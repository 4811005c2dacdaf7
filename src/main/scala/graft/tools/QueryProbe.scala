package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic bimodality probe: run ONE registry query K times in one JVM
  * with per-stage metrics (wall / GC / shuffle bytes+records / task count)
  * and dump the POST-EXECUTION adaptive plan of the slowest and fastest
  * repeats — the TfidfProbe pattern generalized, built when r10's bench
  * measured `minhash_near_dups` at [30.7, 5.3, 31.1] s and
  * `bigram_logprob_scores` at [2.3, 1.4, 11.7] s on an IDLE box (external
  * CPU gate ~0): run-to-run flips that size suggest an AQE
  * stage-completion race picking a different build side / partition count
  * per run, the exact disease r9 root-caused in tfidf.
  *
  * Usage: runMain graft.tools.QueryProbe <queryName> [dir] [repeats]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: QueryProbe <query> [dir] [k]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val k = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(a, b) = kv.split("=", 2); spark.conf.set(a.trim, b.trim)
      })

    val q = graft.SparkEntry.registry.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown query '$name'"))

    // per-repeat stage log, flushed only for the extremes
    val stages = new scala.collection.mutable.ArrayBuffer[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val wall = (for {s <- si.submissionTime; e <- si.completionTime}
            yield (e - s) / 1e3).getOrElse(-1.0)
          stages.synchronized { stages +=
            (f"[stage] id=${si.stageId}%4d wall=$wall%7.2f s " +
              f"gc=${m.jvmGCTime / 1e3}%6.2f s " +
              f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2f MB " +
              f"swRec=${m.shuffleWriteMetrics.recordsWritten / 1e6}%7.2f M " +
              f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2f MB " +
              f"srRec=${m.shuffleReadMetrics.recordsRead / 1e6}%7.2f M " +
              f"tasks=${si.numTasks}%3d  ${si.name.takeWhile(_ != '\n')}")
          }
          ()
        }
      })

    var worst = -1.0; var worstLog = Seq.empty[String]; var worstPlan = ""
    var best = Double.MaxValue; var bestPlan = ""
    val walls = (1 to k).map { i =>
      stages.synchronized(stages.clear())
      val df = q.run(spark, dir)
      // cache-substitution check at the moment Force would plan: how many
      // InMemoryTableScan nodes does a fresh planning see right now?
      val imr = df.queryExecution.optimizedPlan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }.size
      println(s"[probe] run $i: InMemoryRelation nodes at plan time = $imr")
      val s0 = System.nanoTime()
      Force.noop(df)
      val sec = (System.nanoTime() - s0) / 1e9
      Thread.sleep(800) // let stage-completed events drain
      val plan = df.queryExecution.executedPlan.toString
      if (sec > worst) { worst = sec
        worstLog = stages.synchronized(stages.toSeq); worstPlan = plan }
      if (sec < best) { best = sec; bestPlan = plan }
      println(f"[probe] $name run $i: $sec%.2f s")
      sec
    }
    println(f"[probe] $name walls=${walls.map(w => f"$w%.2f").mkString(",")}")
    println(s"[probe] ---- slowest run ($worst%.2f s) stages ----")
    worstLog.foreach(println)
    println(s"[probe] ---- slowest-run adaptive plan ----")
    println(worstPlan)
    println(s"[probe] ---- fastest-run adaptive plan ----")
    println(bestPlan)
    spark.stop()
  }
}
