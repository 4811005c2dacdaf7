package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the §2.10 co-located-join lever at 100 TB: two fact tables
  * bucketed by the same key join WITHOUT any shuffle (each bucket pair
  * joins locally), where the plain-parquet join exchanges BOTH sides.
  * This is the storage-layout counterpart to `Partitioners.saltedJoin`
  * (skew) and CLUSTERED BY in SQL ingestion (within-segment runs): for a
  * repeatedly-joined pair (fact ⋈ fact — broadcast can't apply), bucketing
  * amortizes the shuffle into the write.
  */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed same-key fact tables join with ZERO exchanges; results " +
      "identical to the plain-parquet join") {
    val n = 10000L
    val orders = spark.range(n).select(col("id").as("okey"),
      (col("id") % 97).as("custkey"), (col("id") * 7 % 1000).as("price"))
    val items = spark.range(n * 3).select((col("id") % n).as("okey"),
      (col("id") % 13).as("qty"))

    val db = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      orders.write.mode("overwrite")
        .bucketBy(8, "okey").sortBy("okey")
        .option("path", s"$db/orders_b").saveAsTable("orders_b")
      items.write.mode("overwrite")
        .bucketBy(8, "okey").sortBy("okey")
        .option("path", s"$db/items_b").saveAsTable("items_b")

      val joined = spark.table("orders_b")
        .join(spark.table("items_b"), "okey")
        .groupBy(col("custkey"))
        .agg(sum(col("price") * col("qty")).as("rev"),
          count(lit(1)).as("lines"))

      // the join itself is exchange-free: the only Exchange in the whole
      // plan is the one the final groupBy needs
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(plan.contains("SortMergeJoin"), plan)
      assert(exchanges == 1, s"expected only the aggregation exchange:\n$plan")
      // select-only join: zero exchanges anywhere
      val noAgg = spark.table("orders_b")
        .join(spark.table("items_b"), "okey")
        .queryExecution.executedPlan.toString
      assert(!noAgg.contains("Exchange"), noAgg)

      // plain-parquet twin shuffles BOTH sides...
      orders.write.mode("overwrite").parquet(s"$db/orders_p")
      items.write.mode("overwrite").parquet(s"$db/items_p")
      val plainJoin = spark.read.parquet(s"$db/orders_p")
        .join(spark.read.parquet(s"$db/items_p"), "okey")
      val plainPlan = plainJoin.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plainPlan).size == 2,
        plainPlan)

      // ...and both produce identical results
      val a = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val b = plainJoin.groupBy(col("custkey"))
        .agg(sum(col("price") * col("qty")).as("rev"), count(lit(1)).as("lines"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(a == b && a.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS items_b")
    }
  }
}
