package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MinHash, TextFunctions}
import graft.queries.Tables

/** Measurement harness for the simhash_near_dups oracle-flip: over every
  * documents pair with exact shingle-jaccard ≥ threshold (the DuckDB-oracle
  * ground truth set), print the simhash hamming distribution — the oracle
  * equality `banded-candidates ∩ {j ≥ t} == {j ≥ t}` holds iff the max
  * hamming over that set stays below the banding's pigeonhole bound.
  */
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-simhash-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val d = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        TextFunctions.simhash(col("text")).as("sh"),
        MinHash.shingles(col("text"), 3).as("shg"))
      .cache()
    val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("shg").as("sg_a"))
    val b = d.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("shg").as("sg_b"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sg_a"), col("sg_b"))).cast("double") /
          size(array_union(col("sg_a"), col("sg_b"))))
      .withColumn("hamming", TextFunctions.hammingDistance(col("sh_a"), col("sh_b")))
      .cache()
    println("== hamming distribution over pairs with jaccard >= 0.3 ==")
    pairs.filter(col("jaccard") >= 0.3)
      .groupBy(col("hamming")).count().orderBy(col("hamming")).show(100)
    println("== jaccard distribution over pairs with hamming <= 7 ==")
    pairs.filter(col("hamming") <= 7)
      .groupBy(round(col("jaccard"), 1).as("j")).count().orderBy(col("j")).show(100)
    spark.stop()
  }
}
