package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.config.{AggregatorSpec, IngestionSpec}
import graft.pipeline.Pipeline

/** Query-time merge of per-batch partial rollups — the engine's analog of
  * Druid merging incremental segments at query time (the reference delivers
  * each send batch to the task separately; SURVEY §2.1 Druid task sink).
  *
  * [[graft.streaming.IngestStream.start]] writes one partial rollup row per
  * (micro-batch × bucket × dims); `read` re-aggregates them into the final
  * rollup. Only decomposable aggregators re-merge from finalized values
  * (count→sum, sum→sum, min→min, max→max, incl. inside `filtered`); sketches
  * (hyperUnique / approxHistogram) do NOT — their finalized outputs aren't
  * mergeable, exactly why the watermarked mode
  * ([[graft.streaming.IngestStream.startWatermarked]]) exists: there the state
  * store merges sketch state across batches and emits each bucket once.
  *
  * Scale: the merge is a groupBy on (bucket, dims) over already-reduced rows —
  * input cardinality is segments × dims × batches, orders of magnitude below
  * raw events; partition pruning on `segment=` dirs applies before the scan.
  */
object SegmentStore {

  def mergeColumn(spec: AggregatorSpec): Column = spec.aggType match {
    case "count" | "longSum" => sum(col(spec.name)).cast(LongType).as(spec.name)
    case "doubleSum"         => sum(col(spec.name)).as(spec.name)
    case "longMin"           => min(col(spec.name)).cast(LongType).as(spec.name)
    case "longMax"           => max(col(spec.name)).cast(LongType).as(spec.name)
    case "doubleMin"         => min(col(spec.name)).as(spec.name)
    case "doubleMax"         => max(col(spec.name)).as(spec.name)
    case "filtered" =>
      val d = spec.aggregator.getOrElse(
        throw new IllegalArgumentException(s"filtered ${spec.name} lacks delegate"))
      mergeColumn(d.copy(name = spec.name))
    case other =>
      throw new IllegalArgumentException(
        s"aggregator '$other' (${spec.name}) is not re-mergeable from finalized " +
          "values; ingest it with startWatermarked (state-store merge) instead")
  }

  /** Read a segment store written in per-batch mode and produce the final
    * rollup (one row per bucket × dims). `mergeSchema=true` tolerates schema
    * evolution across chunks (new dims appear as nulls in old segments —
    * SURVEY §2.9 schema-evolution row).
    */
  def read(spark: SparkSession, path: String, spec: IngestionSpec): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val dimNames = df.columns.toSeq.filterNot { c =>
      c == Pipeline.TsCol || c == Pipeline.SegmentCol || c == "__batch_id" ||
        spec.dataSchema.aggregators.exists(_.name == c)
    }
    val merges = spec.dataSchema.aggregators.map(mergeColumn)
    df.groupBy((Pipeline.TsCol +: Pipeline.SegmentCol +: dimNames).map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Compaction: rewrite per-batch partials as finals, one pass per store —
    * the analog of Druid segment compaction. At scale this is the periodic
    * job that keeps read amplification bounded: input rows = partials
    * (segments × dims × batches), output = finals, partitioned by the same
    * segment key so readers and partition pruning are unaffected.
    */
  def compact(spark: SparkSession, path: String, spec: IngestionSpec,
      outPath: String): Unit = {
    read(spark, path, spec)
      .write.mode("overwrite").partitionBy(Pipeline.SegmentCol).parquet(outPath)
  }
}
