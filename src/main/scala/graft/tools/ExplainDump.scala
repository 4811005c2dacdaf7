package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the headline queries — the
  * plan-quality feedback loop (pushdown, broadcast, codegen spans).
  * Usage: runMain graft.tools.ExplainDump [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 2nd arg: comma-separated query names (default: the bench headliners)
    val picked = args.drop(1).headOption match {
      case Some(names) =>
        val want = names.split(",").toSet
        graft.SparkEntry.registry.filter(q => want(q.name))
      case None => graft.SparkEntry.headlines
    }
    picked.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
