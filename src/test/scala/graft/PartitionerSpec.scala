package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.Partitioners
import graft.time.Granularity

/** Partitioner semantics (SURVEY §2.10): stability (same key → same
  * partition), time-and-dims colocation (rows that collapse under rollup land
  * together), round-robin balance.
  */
class PartitionerSpec extends SparkSpec {
  import spark.implicits._

  test("hash partitioning is stable and colocates equal keys") {
    val df = (1 to 1000).map(i => (i % 7, s"k${i % 7}")).toDF("k", "name")
    val parted = Partitioners.repartitionByHash(df, 8, Seq(col("k")))
    // every key lives in exactly one partition
    val spread = parted.withColumn("pid", spark_partition_id())
      .groupBy($"k").agg(countDistinct($"pid").as("n"))
      .agg(max($"n")).as[Long].head()
    assert(spread == 1L)
  }

  test("time-and-dims partitioner colocates rollup groups") {
    val rows = (0 until 200).map { i =>
      (Timestamp.valueOf(s"2024-01-01 ${10 + i % 3}:${i % 50}:00"), s"d${i % 5}", i)
    }
    val df = rows.toDF("ts", "dim", "v")
    val parted = Partitioners.repartitionByTimeAndDims(
      df, 6, Granularity.Hour, col("ts"), Seq(col("dim")))
    val spread = parted
      .withColumn("pid", spark_partition_id())
      .groupBy(Granularity.Hour.truncate($"ts"), $"dim")
      .agg(countDistinct($"pid").as("n"))
      .agg(max($"n")).as[Long].head()
    assert(spread == 1L)
  }

  test("round robin spreads rows evenly") {
    val df = (1 to 1000).map(i => ("same-key", i)).toDF("k", "v")
    val counts = Partitioners.roundRobin(df, 4)
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid").count().as[(Int, Long)].collect().map(_._2)
    assert(counts.length == 4 && counts.forall(c => c >= 200 && c <= 300))
  }

  test("salted join: result-identical to the plain join, hot key spread over reducers") {
    // 90% of fact rows share key 0 — the shape that piles one reducer
    val fact = (1 to 2000).map(i => (if (i % 10 != 0) 0L else (i % 7).toLong, i))
      .toDF("k", "v")
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (2L, "b2"), (5L, "c"))
      .toDF("k", "w") // note the DUPLICATE dim key 2
    val plain = fact.join(dim, Seq("k"))
      .select($"k", $"v", $"w").as[(Long, Int, String)].collect().sorted
    val salted = Partitioners.saltedJoin(fact, dim, "k", 8)
      .select($"k", $"v", $"w").as[(Long, Int, String)].collect().sorted
    assert(salted.sameElements(plain))

    // the hot key's rows really do scatter across several salt buckets
    val spread = fact.filter($"k" === 0L)
      .withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .select($"__salt").distinct().count()
    assert(spread >= 6, s"hot key used only $spread of 8 salt buckets")
  }

  test("schemaless map payload projection filters excluded keys") {
    import graft.config._
    val spec = IngestionSpec(DataSchema("m", TimestampSpec("ts"),
      SchemalessDimensions(dimensionExclusions = Seq("secret")),
      Seq(AggregatorSpec("count", "cnt"))))
    val p = new graft.pipeline.Pipeline(spec)
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"),
        Map("a" -> "1", "secret" -> "x", "b" -> "2"))
    ).toDF("ts", "payload")
    val out = p.projectMapPayload(df, "payload")
      .select(map_keys($"payload").as("ks")).as[Seq[String]].head()
    assert(out.sorted == Seq("a", "b"))
  }
}
