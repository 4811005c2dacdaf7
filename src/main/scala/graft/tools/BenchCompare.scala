package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-comparison bench (SURVEY §7 step 8): approx vs exact distinct, and
  * explicit pre-repartition vs letting the aggregation shuffle — prints one
  * JSON line per variant. Decision input for which defaults the engine keeps.
  *
  * Usage: runMain graft.tools.BenchCompare [sfDir]
  */
object BenchCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
      .crossJoin(spark.range(40)).select(col("doc_id"), col("text")).cache()
    docs.count()

    val variants: Seq[(String, () => DataFrame)] = Seq(
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
      "simhash_native" -> (() => docs
        .select(graft.functions.TextFunctions.simhash(col("text")).as("h"))
        .groupBy().agg(count_distinct(col("h")))),
      "simhash_hof" -> (() => docs
        .select(graft.functions.TextFunctions.simhashHof(col("text")).as("h"))
        .groupBy().agg(count_distinct(col("h")))))

    variants.foreach { case (name, f) => f().count() } // warm-up all
    variants.foreach { case (name, f) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"variant":"$name","best_sec":${times.min}%.3f,"runs":${times.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    }
    spark.stop()
  }
}
