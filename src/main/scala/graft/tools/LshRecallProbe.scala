package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Measured recall@10 for sign-LSH ANN, single-probe vs multi-probe, against
  * brute-force ground truth on the sf embeddings (near-uniform random — the
  * WORST case for any locality structure). Prints one JSON line per config:
  * recall plus candidate fraction (the honest cost axis: recall without the
  * fraction of the corpus probed would overstate the win).
  *
  * Usage: runMain graft.tools.LshRecallProbe [sfDir]
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").cache()
    val n = e.count()
    val queries = e.filter($"vec_id" % 100 === 0).limit(20)
      .select($"vec_id".as("qid"), $"embedding".as("qv")).cache()
    val nq = queries.count()

    // brute-force ground truth: top-10 per query
    val truth = queries.crossJoin(e).filter($"vec_id" =!= $"qid")
      .withColumn("c", VectorFunctions.cosine($"embedding", $"qv"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"c".desc, $"vec_id")))
      .filter($"rk" <= 10).select($"qid", $"vec_id")
      .as[(Long, Long)].collect().toSet

    for (bits <- Seq(4, 6, 8); flips <- Seq(0, 2, 4)) {
      val bucketed = e.withColumn("bucket",
        VectorFunctions.lshBucket($"embedding", bits = bits))
      val probes = queries.select($"qid", $"qv",
        explode(VectorFunctions.lshProbeBuckets($"qv", bits = bits, flips = flips))
          .as("bucket"))
      val cand = bucketed.join(probes, Seq("bucket")).filter($"vec_id" =!= $"qid")
      val candCount = cand.count()
      val got = cand
        .withColumn("c", VectorFunctions.cosine($"embedding", $"qv"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"qid").orderBy($"c".desc, $"vec_id")))
        .filter($"rk" <= 10).select($"qid", $"vec_id")
        .as[(Long, Long)].collect().toSet
      val recall = got.intersect(truth).size.toDouble / truth.size
      val frac = candCount.toDouble / (nq * (n - 1))
      println(f"""{"bits":$bits,"flips":$flips,"recall_at_10":$recall%.3f,"candidate_frac":$frac%.4f}""")
    }
    spark.stop()
  }
}
