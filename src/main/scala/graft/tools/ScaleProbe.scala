package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scale check: replicates the sf0.1 fact tables xN into /tmp
  * (lineitem ~6M rows at N=10, events 1M) with remapped keys, then times the
  * headline queries there. The point is not the absolute numbers but the
  * SHAPE: if a plan's runtime grows ~linearly with N while the plan stays
  * scan→broadcast-join→single-shuffle-agg, it will survive the next 100×
  * (SURVEY "would this partition strategy hold at 1000× the data?").
  *
  * Usage: runMain graft.tools.ScaleProbe [N] [baseSf]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val baseSf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = s"/tmp/graft-scale-x$n"
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

    // replicate facts with key remapping so join fan-outs stay realistic;
    // dims stay as-is (they'd be broadcast at any scale)
    def replicate(table: String, keyCols: Seq[String]): Unit = {
      val src = graft.queries.Tables.t(spark, baseSf, table)
      val copies = spark.range(n).withColumnRenamed("id", "__copy")
      val big = src.crossJoin(copies)
      val remapped = keyCols.foldLeft(big) { (df, k) =>
        df.withColumn(k, col(k) + col("__copy") * 10000000L)
      }
      remapped.drop("__copy")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    val t0 = System.nanoTime()
    replicate("lineitem", Seq("l_orderkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("events", Seq("event_id"))
    // text corpus scales too (identical bodies per copy — adversarial for
    // the gram/shingle shuffles: every key becomes n× hot)
    replicate("documents", Seq("doc_id"))
    Seq("region", "nation", "supplier", "part", "embeddings").foreach { t =>
      graft.queries.Tables.t(spark, baseSf, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    val genSec = (System.nanoTime() - t0) / 1e9

    // 3rd arg: comma-separated query names (default: the bench headliners)
    val qs = args.lift(2) match {
      case Some(names) =>
        val want = names.split(",").toSet
        graft.SparkEntry.registry.filter(q => want(q.name))
      case scala.None => graft.SparkEntry.headlines
    }
    qs.foreach(q => try q.run(spark, out).count() catch { case _: Throwable => () })
    val results = qs.map { q =>
      val s0 = System.nanoTime()
      val ok = try { q.run(spark, out).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[scale] ${q.name} FAILED: ${e.getMessage}"); false }
      q.name -> (if (ok) (System.nanoTime() - s0) / 1e9 else -1.0)
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(f"""{"scale_x":$n,"gen_sec":$genSec%.1f,"total_sec":${results.map(_._2).sum}%.3f,"queries":$qJson}""")
    spark.stop()
  }
}
