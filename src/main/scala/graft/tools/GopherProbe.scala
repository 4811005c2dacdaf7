package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Phase attribution for gopher_repetition_signals at a replicated scale:
  * where do the ~24 s at ×30 go — the 9·L posexplode + gram-string build,
  * the (doc,n,gram) count shuffle, or the per-(doc,n) aggregates? Each
  * stage is noop-forced cumulatively; warm repeats (min of 2) after a
  * warm-up. Usage: runMain graft.tools.GopherProbe [corpusDir]
  */
object GopherProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale-x30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
    def grams = docs
      .select(col("doc_id"), col("w"),
        explode(typedlit((2 to 10).toArray)).as("n"))
      .filter(size(col("w")) >= col("n"))
      .select(col("doc_id"), col("n"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (col("n") - 1))).as("i"))
      .select(col("doc_id"), col("n"),
        concat_ws(" ", slice(col("w"), col("i"), col("n"))).as("gram"))
    // hashed variant: fixed-arity xxhash64 with null padding (hash exprs
    // skip nulls; n rides the group key so cross-n padding cannot collide)
    def gramsHashed = docs
      .select(col("doc_id"), col("w"),
        explode(typedlit((2 to 10).toArray)).as("n"))
      .filter(size(col("w")) >= col("n"))
      .select(col("doc_id"), col("n"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (col("n") - 1))).as("i"))
      .select(col("doc_id"), col("n"),
        xxhash64((0 until 10).map(k =>
          when(lit(k) < col("n"), element_at(col("w"), col("i") + k))
            .otherwise(lit(null))): _*).as("gh"),
        aggregate(slice(col("w"), col("i"), col("n")),
          lit(0L), (acc, x) => acc + length(x)).as("gc"))
    def counts = grams.groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .withColumn("gc", length(translate(col("gram"), " ", "")).cast(LongType))
    def countsHashed = gramsHashed
      .groupBy(col("doc_id"), col("n"), col("gh"))
      .agg(count(lit(1)).as("c"), max(col("gc")).as("gc"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Force.noop(df) // warm
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Force.noop(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"stage":"$name","sec":${secs.min}%.2f}""")
    }
    if (!sys.env.contains("EXPR_ONLY")) {
      time("explode_plus_gramstring")(grams)
      time("explode_hashed_keys")(gramsHashed)
      time("counts_string")(counts)
      time("counts_hashed")(countsHashed)
    }
    // native-expression phases: bare struct, projected fields, full query
    graft.functions.GraftFunctions.register(spark)
    def exprBare = docs.select(col("doc_id"),
      call_function("repetition_signals", col("w")).as("r"))
    def exprFields = exprBare.select(col("doc_id"), col("r.*"))
    println(s"""{"scan_partitions":${docs.rdd.getNumPartitions}}""")
    time("expr_bare_struct")(exprBare)
    time("expr_projected_fields")(exprFields)
    time("expr_repart64")(docs.repartition(64)
      .select(col("doc_id"), call_function("repetition_signals", col("w")).as("r")))
    time("expr_sample30pct")(docs.sample(0.3)
      .select(col("doc_id"), call_function("repetition_signals", col("w")).as("r")))
    println(exprFields.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.filter(l => l.contains("repetition_signals") ||
        l.contains("Project")).take(8).mkString("\n"))
    spark.stop()
  }
}
