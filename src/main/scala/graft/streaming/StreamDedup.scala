package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.functions.{GraftFunctions, MinHash}

/** Streaming near-duplicate dedup AGAINST HISTORY — the continual-ingest
  * analog of [[graft.functions.MinHash.nearDupPairs]]: every arriving
  * document is checked against everything the stream has already seen, and
  * dropped if a seen document is MinHash-similar. This is the operation a
  * continuously-fed training-data pipeline runs at the door (the batch
  * pair pipeline answers "which documents in THIS corpus duplicate each
  * other"; this answers "is this NEW document a duplicate of anything,
  * ever") — classic keep-first dedup over Broder MinHash signatures with
  * LSH banding (Broder '97; Leskovec et al., MMDS ch. 3).
  *
  * Mechanics: one stateful operator, keyed by LSH band hash.
  * `flatMapGroupsWithState` holds, per band bucket, the (docId, signature)
  * of every seen document that hashed into it; an arriving document is a
  * duplicate IN THAT BAND if a seen doc with a SMALLER docId has signature
  * similarity (matching minhash components / k — the standard Jaccard
  * estimator) ≥ `threshold`. All `bands` verdicts for a document emit in
  * its own arrival micro-batch, so the per-document OR ("dup in any band")
  * is a plain batch-local aggregation in `foreachBatch`
  * ([[survivorIds]]) — no second stateful operator, which Structured
  * Streaming would reject after flatMapGroupsWithState.
  *
  * Ordering contract (what makes the result deterministic and
  * model-checkable): within a batch, bucket groups process documents in
  * ascending docId; across batches, earlier batches are simply "seen".
  * A document is therefore dropped iff some document with (earlier batch,
  * or same batch AND smaller docId) — and, in all cases, smaller docId —
  * collides in ≥1 band with signature similarity ≥ threshold. Feeding
  * batches in ascending-docId order makes this EXACTLY the batch
  * predicate "drop j iff ∃ i<j banded pair with sigSim ≥ t"
  * (StreamDedupSpec pins stream ≡ an independent driver model, including
  * across checkpoint restarts).
  *
  * Scale shape: per micro-batch, ONE shuffle keyed by band hash carrying
  * slim rows (docId + k longs + the 8-byte key); the seen-document index
  * IS the state store (RocksDB-backed on a real cluster), which is how a
  * 100 TB continual-ingest dedup holds its history. `horizonMs` bounds
  * each bucket by a dedup horizon: entries older than the horizon are
  * evicted LAZILY, on the next access to their bucket — semantically
  * equivalent to eager expiry, because suppression only ever happens on
  * access (an expired entry can never drop a new document). Deliberately
  * NOT GroupStateTimeout.ProcessingTimeTimeout: a processing-time timeout
  * makes the stateful operator report "run another batch" on EVERY
  * trigger, so the engine busy-loops no-data micro-batches for the life
  * of the query (measured here: 100+ empty batches churned through
  * codegen + the sink before the first real second elapsed). The cost of
  * lazy eviction is storage, not correctness — a bucket never touched
  * again keeps its tail until state-store-level retention reclaims it.
  * 0 keeps history forever. Pair this with at-source EXACT dedup
  * (`dropDuplicatesWithinWatermark` on a text digest, IngestStream's
  * dedupKeys) so clone classes never reach the bucket state — the
  * streaming edition of the ExactCollapse lesson: without it a clone
  * class of size m adds m signatures to every one of its buckets.
  */
object StreamDedup {

  /** One exploded row: a document's id + full signature, keyed by one of
    * its band hashes. */
  case class BandRow(docId: Long, sig: Array[Long], bandHash: Long)

  /** Per-bucket state: every (docId, signature) that hashed here, stamped
    * with its arrival batch's processing time for lazy horizon eviction. */
  case class SeenDoc(docId: Long, sig: Array[Long], seenAtMs: Long)
  case class BucketState(seen: List[SeenDoc])

  /** Per-(document, band) verdict; OR over a document's bands = dup. */
  case class BandVerdict(docId: Long, dup: Boolean)

  /** Matching-component MinHash similarity ≥ threshold. Unequal lengths
    * mean the state was built with a different k than the stream (a
    * bootstrapState/bandVerdicts mismatch) — fail LOUD; comparing a prefix
    * would silently mis-score every verdict. A bands mismatch is not
    * detectable here (disjoint band-hash keyspaces simply never collide,
    * so history suppresses nothing) — keep k AND bands identical between
    * the bootstrap and the stream, as start() does by construction. */
  private def simOk(a: Array[Long], b: Array[Long], t: Double): Boolean = {
    if (a.length != b.length) throw new IllegalStateException(
      s"signature length mismatch (${a.length} vs ${b.length}): the bucket " +
        "state was built with a different k than this stream — " +
        "bootstrapState and bandVerdicts must share k (and bands)")
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length >= t
  }

  /** (docId, sig, bandHash) rows via the shared MinHash expressions — the
    * SAME computation for the stream and the batch bootstrap, so their
    * signatures can never diverge. */
  private def bandRows(docs: DataFrame, k: Int, bands: Int,
      shingleWidth: Int): Dataset[BandRow] = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    // NULL text would propagate a null signature into the state rows (an
    // executor NPE at compare time); coalesce to empty — empty/short texts
    // take the whole-text shingle fallback, so all empties are mutual
    // exact dups and keep-first retains exactly one (spec-pinned)
    docs
      .withColumn("sh", array_distinct(
        MinHash.shingles(coalesce(col("text"), lit("")), shingleWidth)))
      .withColumn("sig", MinHash.signature(col("sh"), k))
      .select(col("doc_id").cast("long").as("docId"), col("sig"),
        explode(MinHash.bandHashes(col("sig"), k, bands)).as("bandHash"))
      .as[BandRow]
  }

  /** Batch-build the bucket index from an EXISTING corpus, for use as the
    * stream's initial state — the operation that makes continual-ingest
    * dedup deployable at 100 TB: the history index is built ONCE, in batch,
    * with one corpus shuffle keyed by the same band hash the stream groups
    * on, instead of replaying the whole corpus through micro-batches.
    * Exact-collapsed like the live state (one entry per signature class per
    * bucket, smallest docId — the redundancy argument on the live path),
    * so a clone-heavy corpus bootstraps to the same compact index the
    * stream itself would converge to. `stampMs` is the horizon stamp the
    * bootstrapped entries carry: leave 0 when the stream runs without a
    * horizon (stamps are never read); pass the bootstrap wall-clock time
    * when pairing with `horizonMs > 0`, or an older stamp to pre-age the
    * corpus. The second, index-sized shuffle (grouping the per-bucket rows
    * into the KeyValueGroupedDataset shape initialState wants) is over
    * collapsed buckets, not the corpus.
    *
    * Initial state binds on the query's FIRST micro-batch only (batch 0) —
    * a restart from checkpoint keeps the evolved store, exactly the
    * deploy-once semantics a bootstrap should have (spec-pinned).
    *
    * The corpus scan + signature stage rides the INPUT layout (the engine
    * never forces a reshuffle on a corpus-sized frame); everything after
    * the first exchange re-parallelizes to spark.sql.shuffle.partitions.
    * A single-file corpus therefore under-parallelizes exactly like any
    * other single-file scan — lay the history out in >= cluster-core
    * files, as any at-rest store already is. */
  def bootstrapState(docs: DataFrame, k: Int = 32, bands: Int = 8,
      shingleWidth: Int = 3, stampMs: Long = 0L)
      : KeyValueGroupedDataset[Long, BucketState] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // collapse RELATIONALLY before anything typed touches the data: equal
    // sigs ⇒ similarity 1.0 ≥ any legal threshold, so only the smallest
    // docId per (bucket, signature) class can ever matter — the same
    // collapse the live path applies in-state. As a codegen'd hash
    // aggregate this gets map-side combine, so a clone-heavy corpus
    // shrinks to its class representatives BEFORE the shuffle (the typed
    // mapGroups formulation shipped every corpus band row through a typed
    // exchange and ran 6x slower at x100 clones); only collapsed,
    // index-sized rows reach the per-bucket list assembly.
    bandRows(docs, k, bands, shingleWidth)
      .groupBy(col("bandHash"), col("sig"))
      .agg(min(col("docId")).as("docId"))
      .select(col("bandHash"), struct(col("docId"), col("sig"),
        lit(stampMs).as("seenAtMs")).as("sd"))
      .groupBy(col("bandHash")).agg(collect_list(col("sd")).as("seen"))
      .select(col("bandHash").as("_1"), struct(col("seen")).as("_2"))
      .as[(Long, BucketState)]
      .groupByKey(_._1).mapValues(_._2)
  }

  /** The stateful core: streaming (doc_id, text) → per-band verdicts.
    * Aggregate with [[survivorIds]] inside foreachBatch. `initial` seeds
    * the bucket index from [[bootstrapState]] — verdicts are only ever
    * emitted for STREAMED documents; the bootstrap corpus is "already
    * seen", it never re-emits. */
  def bandVerdicts(docs: DataFrame, k: Int = 32, bands: Int = 8,
      shingleWidth: Int = 3, threshold: Double = 0.5,
      horizonMs: Long = 0L,
      initial: Option[KeyValueGroupedDataset[Long, BucketState]] = None)
      : Dataset[BandVerdict] = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(horizonMs >= 0, s"horizonMs must be >= 0, got $horizonMs")
    val spark = docs.sparkSession
    import spark.implicits._
    val grouped = bandRows(docs, k, bands, shingleWidth).groupByKey(_.bandHash)
    val f = verdictFunc(threshold, horizonMs)
    initial match {
      case Some(st) => grouped.flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout, st)(f)
      case None => grouped.flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(f)
    }
  }

  /** The per-bucket state machine shared by the plain and bootstrapped
    * paths. */
  private def verdictFunc(threshold: Double, horizonMs: Long)
      : (Long, Iterator[BandRow], GroupState[BucketState]) => Iterator[BandVerdict] = {
        (_: Long, it: Iterator[BandRow], state: GroupState[BucketState]) =>
          // constant throughout the trigger → one clock per batch,
          // restart-safe (stamps persist with the state)
          val now = state.getCurrentProcessingTimeMs()
          val prior = state.getOption.map(_.seen).getOrElse(Nil)
          var seen =
            if (horizonMs > 0) prior.filter(now - _.seenAtMs <= horizonMs)
            else prior
          // track whether this batch changed the bucket at all: a bucket
          // that only saw redundant clones (horizon disabled) needs NO
          // state.update — the state store re-encodes the WHOLE list per
          // updated key per batch, so skipping the no-op write is what
          // keeps clone-heavy multi-batch streams from rewriting every
          // bucket every batch (measured below)
          var changed = seen.lengthCompare(prior.length) != 0
          // ascending docId makes intra-batch processing deterministic
          // (groups receive batch rows in shuffle order, not input order)
          val out = it.toSeq.sortBy(_.docId).map { d =>
            val dup = seen.exists(s =>
              s.docId < d.docId && simOk(s.sig, d.sig, threshold))
            // in-state exact-clone collapse (the ExactCollapse lesson
            // applied to the state store): a doc whose signature is
            // IDENTICAL to an already-seen smaller-id entry is redundant —
            // any future doc it could suppress (future.id > d.id > s.id,
            // same similarity against equal sigs) is already suppressed by
            // s. Refresh s's stamp instead of appending, so a clone class
            // holds ONE state entry and stays horizon-live while clones
            // keep arriving. Without this, clone-heavy streams re-encode
            // ever-growing lists per arrival: measured 7.1x wall for 3.3x
            // rows at x100 clone replication, restored to linear by the
            // collapse (STREAMDEDUP_r9.json). With the horizon DISABLED the
            // stamp is never read (the eviction filter above only runs when
            // horizonMs > 0), so the refresh itself is skipped and a
            // redundant arrival leaves the bucket byte-identical. CONTRACT
            // CORNER: that means horizon-off checkpoints carry FIRST-seen
            // stamps for clone classes; restarting the same checkpoint with
            // a horizon newly armed ages those classes by first arrival,
            // not last. Arming/raising a horizon mid-deployment is a
            // re-bootstrap (or accept the conservative extra evictions).
            val redundant = dup && seen.exists(s =>
              s.docId < d.docId && java.util.Arrays.equals(s.sig, d.sig))
            if (redundant) {
              if (horizonMs > 0) {
                seen = seen.map(s =>
                  if (s.docId < d.docId &&
                      java.util.Arrays.equals(s.sig, d.sig))
                    s.copy(seenAtMs = now)
                  else s)
                changed = true
              }
            } else {
              seen = SeenDoc(d.docId, d.sig, now) :: seen
              changed = true
            }
            BandVerdict(d.docId, dup)
          }
          if (changed) state.update(BucketState(seen))
          out.iterator
  }

  /** Batch-local OR over a document's band verdicts → surviving docIds.
    * Valid inside foreachBatch because every band verdict for a document
    * emits in the document's own arrival batch. */
  def survivorIds(batchVerdicts: DataFrame): DataFrame =
    batchVerdicts.groupBy("docId")
      .agg(max(col("dup")).as("dup"))
      .filter(!col("dup"))
      .select(col("docId").as("doc_id"))

  /** End-to-end convenience: survivors' doc_ids append to `outPath` as
    * parquet, one file set per micro-batch stamped with the batch id,
    * checkpoint at `checkpoint`. Restart-safe: the bucket state is
    * checkpointed with the query. The parquet append itself is
    * AT-LEAST-ONCE (a crash between write and commit replays the final
    * batch with the SAME batch_id — dedupe on read by batch_id if that
    * window matters; a clean stop commits first). */
  def start(docs: DataFrame, outPath: String, checkpoint: String,
      k: Int = 32, bands: Int = 8, shingleWidth: Int = 3,
      threshold: Double = 0.5, horizonMs: Long = 0L,
      bootstrap: Option[DataFrame] = None,
      bootstrapStampMs: Long = 0L): StreamingQuery = {
    // a bootstrap under an armed horizon with the default stamp (0) would
    // silently expire the ENTIRE history index on each bucket's first
    // access — every known duplicate would then survive. Fail loud at
    // start; pass the bootstrap wall-clock (or an intentional pre-age).
    require(bootstrap.isEmpty || horizonMs == 0L || bootstrapStampMs > 0L,
      s"bootstrap with horizonMs=$horizonMs needs bootstrapStampMs > 0 " +
        "(the bootstrap time, or an older stamp to pre-age the corpus); " +
        "stamp 0 would expire the whole bootstrapped index immediately")
    bandVerdicts(docs, k, bands, shingleWidth, threshold, horizonMs,
      bootstrap.map(b => bootstrapState(b, k, bands, shingleWidth,
        bootstrapStampMs)))
      .toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        survivorIds(batch)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
  }
}
