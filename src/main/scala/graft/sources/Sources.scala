package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream sources (SURVEY §2.1): the engine-side analogs of the reference's
  * ingestion daemons.
  *
  *  - library send (`Tranquilizer.send`)     → MemoryStream (tests) or any
  *    `DataFrame` handed to [[graft.streaming.IngestStream.start]]
  *  - Kafka consumer daemon (KafkaConsumer.java) → `readStream.format("kafka")`
  *    (wiring below; needs a broker — the checkpoint IS the offset-commit
  *    contract: offsets advance only after the sink commit, exactly the
  *    reference's commit-after-flush at-least-once linchpin, SURVEY §3.3)
  *  - HTTP ingest server (TranquilityServlet)  → file-drop directory (v1):
  *    producers drop JSON files; `fileStream` tails the dir. Same NDJSON/
  *    JSON-array bodies, minus the socket.
  */
object Sources {

  /** File-drop streaming source over newline-delimited JSON with an explicit
    * schema (schema inference is banned in streams for determinism —
    * SURVEY §7 hard part (c)).
    */
  def jsonFileStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Parquet-drop streaming source (used to replay the testdata `events`
    * table as a stream; ns-timestamp handling mirrors
    * [[graft.queries.Tables.t]]).
    */
  def parquetFileStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Replay the driver's events table as a file stream: stage the single
    * parquet file into a directory as `splits` files (file sources need a
    * dir; multiple files + maxFilesPerTrigger=1 → sustained micro-batches,
    * the send-batch cadence of the reference). Returns the streaming
    * DataFrame with `ts` as a proper TimestampType.
    */
  def eventsReplay(spark: SparkSession, sfDir: String, stagingDir: String,
      splits: Int = 8): DataFrame = {
    // ns→µs conversion happens at stage time (same rule as Tables.t: only
    // when ts was physically read as a nanos long — re-written copies of the
    // table already carry TimestampType), so the staged files and the stream
    // schema are uniformly TimestampType.
    val raw = graft.queries.Tables.t(spark, sfDir, "events")
    raw.repartition(splits)
      // staging is transient replay scratch (read back once, then dead) —
      // snappy's cheaper encode beats zstd's smaller files here
      .write.mode("overwrite").option("compression", "snappy").parquet(stagingDir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    parquetFileStream(spark, stagingDir, schema)
  }

  /** The record shape Spark's kafka source produces — also the contract any
    * broker-less test double must emit (KafkaContractSpec drives this schema
    * through [[parseKafkaRecords]] + the checkpoint commit contract).
    */
  val kafkaRecordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Value-parsing stage of the Kafka path, split out so it is testable
    * without a broker: JSON value bytes → typed columns via explicit schema
    * (no inference — SURVEY §7 hard part (c)). Malformed values yield an
    * all-null struct, preserved so drop accounting sees them (upstream
    * KafkaConsumer.java routes unparseable messages to its own counter).
    */
  def parseKafkaRecords(raw: DataFrame, valueSchema: StructType): DataFrame =
    raw.select(from_json(col("value").cast("string"), valueSchema).as("e"))
      .select(col("e.*"))

  /** Kafka wiring (v2 — no broker in this environment, kept as the documented
    * construction): subscribe + JSON value parsing with explicit schema.
    * The checkpoint IS the offset-commit contract — offsets advance only
    * after the sink commit (commit-after-flush, SURVEY §3.3), proven without
    * a broker in KafkaContractSpec.
    */
  def kafkaStream(spark: SparkSession, bootstrap: String, topicPattern: String,
      valueSchema: StructType, maxOffsetsPerTrigger: Long = 10000): DataFrame =
    parseKafkaRecords(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribePattern", topicPattern)
        .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
        .load(),
      valueSchema)
}
