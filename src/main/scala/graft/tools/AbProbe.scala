package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for a session-conf toggle over registry queries — the
  * only timing methodology that survives this box's hypervisor steal
  * (walls breathe 2–7× between quiet and noisy windows, RESULTS_r10 §11):
  * both arms run inside ONE JVM, strictly alternated (A,B,A,B,…) so any
  * contention window hits both arms equally, min-of-k per arm, with
  * per-repeat steal/others stamps so a poisoned window is visible.
  *
  * Usage: runMain graft.tools.AbProbe <conf=valA|valB> <q1,q2,...> [dir] [k] [mode]
  * e.g.   runMain graft.tools.AbProbe spark.graft.fanout=off|on \
  *          unigram_logprob_scores,bigram_logprob_scores /root/testdata/sf0.1 5
  *
  * mode=query (default) alternates arms per QUERY (q·A, q·B, next q) — the
  * hot-loop pattern. mode=set runs the WHOLE query list under one arm, then
  * the whole list under the other (A-set, B-set, A-set, …) — the pattern
  * `graft.Bench` actually executes (18 interleaved queries per repeat), added
  * r11 (verdict r10 #6) after r10's hot-loop A/B verdicts failed to
  * reproduce under the driver's full-bench execution pattern.
  */
object AbProbe {
  private def cpuStamp(): (Long, Long, Long) =
    try {
      val statSrc = scala.io.Source.fromFile("/proc/stat")
      val cpu = try statSrc.getLines().next() finally statSrc.close()
      val f = cpu.trim.split("\\s+").drop(1).map(_.toLong)
      // busy excludes idle(3), iowait(4), guest(8,9) AND steal(7): steal is
      // reported as its own signal, and counting it in busy double-charged
      // hypervisor steal to the `others` clean-repeat filter (advice r10)
      val busy = f.zipWithIndex.collect {
        case (v, i) if i != 3 && i != 4 && i != 7 && i != 8 && i != 9 => v }.sum
      val selfSrc = scala.io.Source.fromFile("/proc/self/stat")
      val line = try selfSrc.mkString finally selfSrc.close()
      val rest = line.substring(line.lastIndexOf(')') + 2).split("\\s+")
      (busy, rest(11).toLong + rest(12).toLong, if (f.length > 7) f(7) else 0L)
    } catch { case _: Throwable => (-1L, -1L, -1L) }

  def main(args: Array[String]): Unit = {
    val Array(confKey, confVals) = args(0).split("=", 2)
    val Array(valA, valB) = confVals.split("\\|", 2)
    val names = args(1).split(",").toSeq
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val k = args.lift(3).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = names.map(n => graft.SparkEntry.registry.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"unknown query '$n'")))

    // warm both arms once (JIT + codegen + footer cache)
    for (q <- qs; v <- Seq(valA, valB)) {
      spark.conf.set(confKey, v)
      try Force.noop(q.run(spark, dir)) catch { case _: Throwable => () }
    }

    val setMode = args.lift(4).contains("set")
    case class Rep(sec: Double, steal: Double, others: Double)
    val out = scala.collection.mutable.Map.empty[(String, String), Vector[Rep]]
      .withDefaultValue(Vector.empty)
    def runOne(q: graft.queries.QueryDef, v: String): Unit = {
      spark.conf.set(confKey, v)
      val (b0, s0, st0) = cpuStamp()
      val t0 = System.nanoTime()
      val sec = try { Force.noop(q.run(spark, dir)); (System.nanoTime() - t0) / 1e9 }
                catch { case e: Throwable => println(s"[ab] ${q.name}/$v FAILED: $e"); -1.0 }
      val (b1, s1, st1) = cpuStamp()
      val steal = if (st0 < 0 || sec <= 0) -1.0 else (st1 - st0) / 100.0 / sec
      val others = if (b0 < 0 || sec <= 0) -1.0
                   else ((b1 - b0) - (s1 - s0)) / 100.0 / sec
      out((q.name, v)) :+= Rep(sec, steal, others)
    }
    if (setMode) // bench-shaped: whole set per arm, arms alternated
      for (i <- 1 to k; v <- Seq(valA, valB); q <- qs) runOne(q, v)
    else // hot-loop: arms alternated per query
      for (i <- 1 to k; q <- qs; v <- Seq(valA, valB)) runOne(q, v)
    for (q <- qs) {
      for (v <- Seq(valA, valB)) {
        val reps = out((q.name, v))
        val clean = reps.filter(r => r.sec >= 0 && r.others <= 1.0)
        val ok = if (clean.nonEmpty) clean else reps.filter(_.sec >= 0)
        // all k repeats failed → report loud, never .min on empty (advice r10)
        if (ok.isEmpty)
          println(f"[ab] ${q.name}%-30s $confKey=$v%-4s ALL $k%d REPEATS FAILED")
        else {
          val m = ok.map(_.sec).min
          println(f"[ab] ${q.name}%-30s $confKey=$v%-4s min=$m%7.3f " +
            s"times=${reps.map(r => f"${r.sec}%.3f").mkString(",")} " +
            s"steal=${reps.map(r => f"${r.steal}%.2f").mkString(",")}")
        }
      }
    }
    spark.stop()
  }
}
