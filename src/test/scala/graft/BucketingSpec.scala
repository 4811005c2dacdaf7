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

  test("compactBucketed store round-trip: zero-exchange join through " +
      "SegmentStore.readBucketed, fresh-session re-attach included") {
    import graft.config._
    import graft.pipeline.Pipeline
    import graft.sink.{SegmentSink, SegmentStore}
    import graft.time.Granularity

    val spec = IngestionSpec(DataSchema("ds",
      TimestampSpec("ts"), SpecificDimensions(Seq("user", "etype")),
      Seq(AggregatorSpec("count", "cnt"),
        AggregatorSpec("doubleSum", "total", Some("value"))),
      GranularitySpec(Granularity.Hour, Granularity.Hour)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-bstore").toString

    // two per-batch partial stores over the same user key space
    def partials(seed: Int) = spark.range(2000)
      .select(
        lit(java.sql.Timestamp.valueOf("2024-03-01 12:00:00")).as(Pipeline.TsCol),
        lit(java.sql.Timestamp.valueOf("2024-03-01 12:00:00")).as(Pipeline.SegmentCol),
        concat(lit("u"), (col("id") % 211).cast("string")).as("user"),
        when(col("id") % 2 === 0, "click").otherwise("view").as("etype"),
        lit(1L).as("cnt"), (col("id") % 7 * seed).cast("double").as("total"))
    SegmentSink.writeBatch(partials(1), s"$tmp/rawA")
    SegmentSink.writeBatch(partials(3), s"$tmp/rawB")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      SegmentStore.compactBucketed(spark, s"$tmp/rawA", spec, s"$tmp/bktA",
        "graft_bktA", Seq("user"), 4)
      SegmentStore.compactBucketed(spark, s"$tmp/rawB", spec, s"$tmp/bktB",
        "graft_bktB", Seq("user"), 4)

      def bucketJoin() = SegmentStore.readBucketed(spark, s"$tmp/bktA", "graft_bktA")
        .select(col("user"), col("cnt").as("cntA"))
        .join(SegmentStore.readBucketed(spark, s"$tmp/bktB", "graft_bktB")
          .select(col("user"), col("cnt").as("cntB")), "user")
      val plan = bucketJoin().queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // plain-parquet read of the SAME files shuffles both sides — the
      // layout pays only through the bucket-aware entry point
      val plainPlan = spark.read.parquet(s"$tmp/bktA")
        .select(col("user"), col("cnt").as("cntA"))
        .join(spark.read.parquet(s"$tmp/bktB")
          .select(col("user"), col("cnt").as("cntB")), "user")
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plainPlan).size == 2, plainPlan)

      val before = bucketJoin().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(before.nonEmpty)

      // fresh-session analog: drop the catalog entries; readBucketed must
      // re-attach from the _graft_buckets sidecar + file layout alone
      spark.sql("DROP TABLE graft_bktA")
      spark.sql("DROP TABLE graft_bktB")
      val after = bucketJoin()
      val planAfter = after.queryExecution.executedPlan.toString
      assert(!planAfter.contains("Exchange"), planAfter)
      assert(after.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq == before)

      // the segment partition key survived attach (partition recovery) and
      // the rollup itself matches the plain compacted read
      val seg = SegmentStore.readBucketed(spark, s"$tmp/bktA", "graft_bktA")
      assert(seg.columns.contains(Pipeline.SegmentCol))
      assert(seg.count() == 211 * 2) // user x etype groups, one hour chunk
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bktA")
      spark.sql("DROP TABLE IF EXISTS graft_bktB")
    }
  }
}
