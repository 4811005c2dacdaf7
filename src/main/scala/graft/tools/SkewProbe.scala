package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-skew join probe (SURVEY §2.10 / r6 verdict item #6): one hot key
  * holding ~50% of a replicated-sf0.1-sized fact table joins a non-broadcast
  * dim, under three treatments:
  *
  *   1. `plain`  — sort-merge join, AQE off: the hot key's rows pile onto
  *      ONE reducer (the behavior that kills a 1000-executor job);
  *   2. `aqe`    — AQE skew-join split (Spark's adaptive mid-shuffle fix);
  *   3. `salted` — [[graft.pipeline.Partitioners.saltedJoin]], the explicit
  *      ahead-of-time tool.
  *
  * Broadcast is disabled throughout (a broadcastable dim would sidestep the
  * question — the probe models the dim too big/dynamic to broadcast). Each
  * treatment reports wall seconds (min of 2) and the max-task/mean-task
  * shuffle-read ratio (the skew itself, via a task-end listener), plus a
  * result-identity cross-check across treatments.
  *
  * Usage: runMain graft.tools.SkewProbe [factRows] [salt]
  */
object SkewProbe {

  /** Collects per-task shuffle-read bytes between reset() and read(). */
  private final class ShuffleReadListener extends SparkListener {
    private val reads = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        val b = t.taskMetrics.shuffleReadMetrics.totalBytesRead
        if (b > 0) reads.add(b)
      }
    def reset(): Unit = reads.clear()
    def stats(): (Double, Double) = {
      val xs = reads.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      if (xs.isEmpty) (0.0, 0.0)
      else (xs.max.toDouble, xs.sum.toDouble / xs.length)
    }
  }

  def main(args: Array[String]): Unit = {
    val factRows = args.headOption.map(_.toLong).getOrElse(6000000L)
    val salt = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // fact: 50% of rows on key 0, the rest uniform over 100k keys;
    // dim: 100k keys with a payload — too many distinct keys to broadcast
    // comfortably at real scale, small enough that salt× replication is
    // cheap (exactly the regime saltedJoin is FOR)
    val nKeys = 100000L
    spark.range(factRows).select(
      when($"id" % 2 === 0, 0L)
        .otherwise(pmod(xxhash64($"id"), lit(nKeys - 1)) + 1L).as("k"),
      ($"id" % 1000).cast("double").as("v"))
      .write.mode("overwrite").parquet("/tmp/graft-skew/fact")
    spark.range(nKeys).select($"id".as("k"),
      concat(lit("grp"), ($"id" % 7).cast("string")).as("grp"))
      .write.mode("overwrite").parquet("/tmp/graft-skew/dim")
    val f = spark.read.parquet("/tmp/graft-skew/fact")
    val d = spark.read.parquet("/tmp/graft-skew/dim")

    def joined(mode: String): DataFrame = mode match {
      case "salted" =>
        graft.pipeline.Partitioners.saltedJoin(f, d, "k", salt)
          .groupBy($"grp").agg(sum($"v").as("sv"), count(lit(1)).as("n"))
      case _ =>
        f.join(d, "k")
          .groupBy($"grp").agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    }

    // `aqe` = defaults (the hot partition must exceed 256 MB to split — at
    // this probe's size it does NOT, which is itself a finding: default AQE
    // quietly leaves sub-threshold skew alone); `aqe_tuned` = the thresholds
    // an operator would actually deploy for known-skewed joins
    def setMode(m: String): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", m.startsWith("aqe"))
      if (m == "aqe_tuned") {
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        // without force, AQE declines to split when the join feeds a
        // same-keyed downstream shuffle (our groupBy) — the common shape
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      } else {
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
      }
    }
    val modes = Seq("plain", "aqe", "aqe_tuned", "salted")

    // result identity across treatments (checksum over the 7 groups)
    val checks = modes.map { m =>
      setMode(m)
      m -> joined(m).collect()
        .map(r => (r.getString(0), math.round(r.getDouble(1)), r.getLong(2)))
        .sortBy(_._1).mkString(";")
    }.toMap
    require(checks.values.toSet.size == 1, s"treatments disagree: $checks")

    val listener = new ShuffleReadListener
    spark.sparkContext.addSparkListener(listener)
    for (mode <- modes) {
      setMode(mode)
      var maxOverMean = 0.0
      val sec = (1 to 2).map { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        joined(mode).count()
        val s = (System.nanoTime() - t0) / 1e9
        val (mx, mean) = listener.stats()
        if (mean > 0) maxOverMean = mx / mean
        s
      }.min
      println(f"""{"mode":"$mode","salt":${if (mode == "salted") salt else 0},""" +
        f""""wall_sec":$sec%.2f,"task_shuffle_max_over_mean":$maxOverMean%.1f}""")
    }
    spark.stop()
  }
}
