package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for `tfidf_top_terms` after the ×100 full-surface
  * sweep measured it superlinear (×30 3.7 s → ×100 29.4 s for 3.3× rows —
  * the only >linear ratio among all 51 queries). Times each constituent
  * alone, then the full query, and prints the POST-EXECUTION adaptive
  * plan (the static explain can't show which join AQE actually picked).
  * Usage: runMain graft.tools.TfidfProbe [dir]
  */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale-x100")
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

    def time[A](label: String)(f: => A): A = {
      val s0 = System.nanoTime()
      val r = f
      println(f"[tfidf] $label%-28s ${(System.nanoTime() - s0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.queries.Tables.t(spark, dir, "documents")
    val n = time("count")(docs.count())
    val tf = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    time("tf agg alone")(Force.noop(tf))
    val df_ = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    time("df agg alone (re-derives tf)")(Force.noop(df_))
    println(s"[tfidf] distinct words = ${df_.count()}, docs = $n")

    // per-stage attribution: wall, executor GC, memory+disk spill
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val wall = (for {s <- si.submissionTime; e <- si.completionTime}
            yield (e - s) / 1e3).getOrElse(-1.0)
          println(f"[stage] id=${si.stageId}%4d wall=$wall%7.2f s " +
            f"gc=${m.jvmGCTime / 1e3}%6.2f s " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2f MB " +
            f"swRec=${m.shuffleWriteMetrics.recordsWritten / 1e6}%7.2f M " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2f MB " +
            f"srRec=${m.shuffleReadMetrics.recordsRead / 1e6}%7.2f M " +
            f"tasks=${si.numTasks}%3d")
        }
      })
    // final ADAPTIVE plan of each forced execution (the frame's own
    // queryExecution is never executed — the noop save plans its own)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          if (qe.executedPlan.toString.contains("Window"))
            println(s"===== executed plan ($funcName, ${durationNs / 1e9}) =====\n" +
              qe.executedPlan.toString.take(8000))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val full = graft.SparkEntry.registry.find(_.name == "tfidf_top_terms").get
    (1 to 4).foreach { i =>
      val frame = time(s"run $i build (incl. count)")(full.run(spark, dir))
      time(s"run $i force")(Force.noop(frame))
    }
    spark.stop()
  }
}
