package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.config.IngestionSpec
import graft.pipeline.Pipeline

/** Structured-Streaming ingest — the engine's Tranquilizer
  * (upstream core/.../tranquilizer/Tranquilizer.scala + beam/ClusteredBeam.scala,
  * SURVEY §3.1). The reference's moving parts map as:
  *
  *  - send buffer / maxBatchSize / linger  → micro-batch trigger + source rate
  *    limits (`maxFilesPerTrigger` / `maxOffsetsPerTrigger`) — backpressure is
  *    the engine's, not a client buffer (SURVEY §4).
  *  - ClusteredBeam chunk routing           → tumbling segment buckets in the
  *    pipeline; no ZK — the checkpoint dir is the beam metadata (SURVEY §2.9).
  *  - windowPeriod late/future drops        → watermark (late side) + explicit
  *    predicate vs injected `now` (future side), with `observe` drop counters —
  *    the SendResult(sent=false) accounting surface.
  *  - flush()/stop() ordered shutdown       → Trigger.AvailableNow drain, then
  *    query.stop().
  */
final class IngestStream(
    spark: SparkSession,
    spec: IngestionSpec,
    checkpointDir: String) {

  val pipeline = new Pipeline(spec)

  @volatile private var query: Option[StreamingQuery] = None

  /** Cumulative {received, sent, dropped} across micro-batches — the
    * Tranquilizer counter surface (`received/sent` of the HTTP reply,
    * SURVEY §3.2).
    */
  val counters = new ConcurrentHashMap[String, Long]()

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val obs = e.progress.observedMetrics
      if (obs.containsKey("graft_window")) {
        val row = obs.get("graft_window")
        Seq("received", "sent", "dropped").foreach { k =>
          counters.merge(k, row.getAs[Long](k), (a, b) => a + b)
        }
      }
    }
  }

  /** Start the ingest query: source stream → pipeline → segment-partitioned
    * Parquet. `now` defaults to processing time; tests inject a literal clock
    * (the TestingTimekeeper analog — SURVEY §5).
    */
  def start(
      source: DataFrame,
      outputPath: String,
      now: Column = current_timestamp(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.streams.addListener(listener)
    val q = source.writeStream
      .queryName(s"graft-${spec.dataSchema.dataSource}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // rollup within the micro-batch; cross-batch merge happens at read
        // time (sum of partial sums per segment dir) or via compaction —
        // matching the reference, where each send batch lands incrementally
        // in the realtime task and Druid merges at query time.
        val out = pipeline(batch, now)
        graft.sink.SegmentSink.writeMicroBatch(outputPath)(out, batchId)
      }
      .start()
    query = Some(q)
    q
  }

  /** Drain all available input then stop — flush()+stop() semantics
    * (upstream Tranquilizer.scala#flush / SimpleTranquilizerAdapter).
    */
  def flushAndStop(): Unit = {
    query.foreach { q =>
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }
    spark.streams.removeListener(listener)
  }

  def received: Long = counters.getOrDefault("received", 0L)
  def sent: Long = counters.getOrDefault("sent", 0L)
  def dropped: Long = counters.getOrDefault("dropped", 0L)
}
