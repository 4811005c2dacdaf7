package graft.streaming

import java.nio.ByteBuffer

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
  * duplicate IN THAT BAND if a seen doc that PRECEDES it (smaller docId, or
  * a bootstrap entry — see below) has signature similarity (matching
  * minhash components / k — the standard Jaccard estimator) ≥ `threshold`.
  * All `bands` verdicts for a document emit in its own arrival micro-batch,
  * so the per-document OR ("dup in any band") is a plain batch-local
  * aggregation in `foreachBatch` ([[survivorIds]]) — no second stateful
  * operator, which Structured Streaming would reject after
  * flatMapGroupsWithState.
  *
  * State layout (r10): each bucket's state is ONE packed byte array —
  * a 4-byte k header, then fixed-width entries (docId 8 | stamp 8 |
  * flags 1 | k×8 signature). BinaryType state passes through the state
  * store untranslated — access is a byte-array hand-off, similarity runs
  * directly over the buffer with zero per-entry allocation, and an append
  * re-encodes nothing but the appended bytes; the r9 layout (a case-class
  * List[SeenDoc] value) paid Spark's reflective product encoder on every
  * bucket access. MEASURED HONESTLY: the re-layout alone did NOT move the
  * r9 multi-batch-vs-single-batch gap (169 s both layouts at ×100) — the
  * gap was (a) micro-batch SCAN parallelism (one staged file per trigger
  * = one parquet row group = ONE core running the whole signature map
  * side; a row group is read by the split containing its midpoint, so
  * byte-range splits cannot fix it — feed many files per trigger, as
  * Kafka partitions do naturally) and (b) state-partition SIZING (every
  * state partition is a RocksDB instance whose per-batch commit machinery
  * is row-independent; 32 instances on one box serialized on sync).
  * With both fixed the ×100 multi-batch replay runs 87.6 s vs 37.2 s
  * single-batch (2.35×, was 5.9×) — STREAMDEDUP_r10.json. (Checkpoints
  * written by the r9 layout are not readable by this one — re-bootstrap
  * rather than migrating state formats.)
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
  * across checkpoint restarts). Bootstrapped corpus entries carry a
  * precedence flag instead of relying on docId order — see
  * [[bootstrapState]].
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
  * 0 keeps history forever. Entries with stamp 0 ("un-stamped") are EXEMPT
  * from the horizon: expiring an entry because `now − 0 > horizon` is
  * never what a caller means, and it is exactly the silent-no-op the
  * r9 start() guard existed for — an un-stamped bootstrap index now
  * persists until re-bootstrap instead of evaporating on first access
  * (live entries always carry a real processing-time stamp). Pair this
  * with at-source EXACT dedup (`dropDuplicatesWithinWatermark` on a text
  * digest, IngestStream's dedupKeys) so clone classes never reach the
  * bucket state — the streaming edition of the ExactCollapse lesson:
  * without it a clone class of size m adds m signatures to every one of
  * its buckets.
  */
object StreamDedup {

  /** One exploded row: a document's id + full signature, keyed by one of
    * its band hashes. */
  case class BandRow(docId: Long, sig: Array[Long], bandHash: Long)

  /** Per-(document, band) verdict; OR over a document's bands = dup. */
  case class BandVerdict(docId: Long, dup: Boolean)

  /** Transport row for the bootstrap build (collapsed class reps per
    * bucket, pre-packing). private[streaming] rather than private: the
    * codegen'd deserializer instantiates these — a bytecode-private
    * constructor fails janino's accessibility check. */
  private[streaming] case class BootSlim(docId: Long, sig: Array[Long])
  private[streaming] case class BootBucket(bandHash: Long, seen: Seq[BootSlim])

  /** Packed per-bucket state: header `[k: int]`, then fixed-width entries
    * `[docId: long][seenAtMs: long][flags: byte][sig: k longs]`, newest
    * first. flags bit 0 = bootstrap-precedes (entry is "earlier" than any
    * streamed document regardless of docId). All byte views are BIG_ENDIAN
    * (ByteBuffer default). */
  private[streaming] object Packed {
    val Header = 4
    val FlagBootstrapPrecedes: Byte = 1

    def entryBytes(k: Int): Int = 17 + 8 * k
    def kOf(st: Array[Byte]): Int = ByteBuffer.wrap(st).getInt(0)
    def count(st: Array[Byte], k: Int): Int =
      (st.length - Header) / entryBytes(k)

    def docIdAt(bb: ByteBuffer, off: Int): Long = bb.getLong(off)
    def stampAt(bb: ByteBuffer, off: Int): Long = bb.getLong(off + 8)
    def flagsAt(bb: ByteBuffer, off: Int): Byte = bb.get(off + 16)

    /** Matching signature components between the packed entry at `off` and
      * `sig`, allocation-free. */
    def matches(bb: ByteBuffer, off: Int, sig: Array[Long]): Int = {
      var eq = 0
      var i = 0
      val base = off + 17
      while (i < sig.length) {
        if (bb.getLong(base + 8 * i) == sig(i)) eq += 1
        i += 1
      }
      eq
    }

    def sigEqualAt(bb: ByteBuffer, off: Int, sig: Array[Long]): Boolean =
      matches(bb, off, sig) == sig.length

    def writeEntry(bb: ByteBuffer, docId: Long, stamp: Long, flags: Byte,
        sig: Array[Long]): Unit = {
      bb.putLong(docId); bb.putLong(stamp); bb.put(flags)
      var i = 0
      while (i < sig.length) { bb.putLong(sig(i)); i += 1 }
    }

    def pack(k: Int, entries: Seq[(Long, Long, Byte, Array[Long])]): Array[Byte] = {
      val bb = ByteBuffer.allocate(Header + entries.length * entryBytes(k))
      bb.putInt(k)
      entries.foreach { case (id, stamp, flags, sig) =>
        writeEntry(bb, id, stamp, flags, sig) }
      bb.array()
    }
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
    * stream itself would converge to.
    *
    * Precedence (r10, advice r9): `precedesStream` (default TRUE) marks
    * every bootstrapped entry as "earlier than any streamed document", so
    * suppression works regardless of the two id spaces — a live stream
    * whose ids restart at 0 is still suppressed by the 100 TB history,
    * which is the feature's whole point. Pass false ONLY when the corpus
    * and the stream genuinely share one monotonic id space and you want
    * keep-first BY ID across both (the r9 semantics; with corpus ids below
    * stream ids the two modes produce identical verdicts — spec-pinned).
    * With false, a corpus entry whose docId is ≥ a streamed docId
    * suppresses NOTHING for that document.
    *
    * `stampMs` is the horizon stamp the bootstrapped entries carry: leave
    * 0 ("un-stamped") and the entries are EXEMPT from any horizon — they
    * persist until re-bootstrap (the safe default; r9 instead silently
    * expired stamp-0 entries on first access under an armed horizon, which
    * start() had to guard). Pass the bootstrap wall-clock time to make the
    * corpus age like live arrivals, or an older stamp to pre-age it.
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
      shingleWidth: Int = 3, stampMs: Long = 0L,
      precedesStream: Boolean = true)
      : KeyValueGroupedDataset[Long, Array[Byte]] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val flags: Byte =
      if (precedesStream) Packed.FlagBootstrapPrecedes else 0
    // collapse RELATIONALLY before anything typed touches the data: equal
    // sigs ⇒ similarity 1.0 ≥ any legal threshold, so only the smallest
    // docId per (bucket, signature) class can ever matter — the same
    // collapse the live path applies in-state. As a codegen'd hash
    // aggregate this gets map-side combine, so a clone-heavy corpus
    // shrinks to its class representatives BEFORE the shuffle (the typed
    // mapGroups formulation shipped every corpus band row through a typed
    // exchange and ran 6x slower at x100 clones); only collapsed,
    // index-sized rows reach the per-bucket packing.
    bandRows(docs, k, bands, shingleWidth)
      .groupBy(col("bandHash"), col("sig"))
      .agg(min(col("docId")).as("docId"))
      .select(col("bandHash"), struct(col("docId"), col("sig")).as("sd"))
      .groupBy(col("bandHash")).agg(collect_list(col("sd")).as("seen"))
      .as[BootBucket]
      .map(b => (b.bandHash,
        Packed.pack(k, b.seen.map(s => (s.docId, stampMs, flags, s.sig)))))
      .groupByKey(_._1).mapValues(_._2)
  }

  /** The stateful core: streaming (doc_id, text) → per-band verdicts.
    * Aggregate with [[survivorIds]] inside foreachBatch. `initial` seeds
    * the bucket index from [[bootstrapState]] — verdicts are only ever
    * emitted for STREAMED documents; the bootstrap corpus is "already
    * seen", it never re-emits. Also runs on a BATCH DataFrame (Spark
    * executes flatMapGroupsWithState per-group with fresh state), where it
    * computes exactly the single-batch keep-first predicate — the
    * driver-visible correctness entry uses this. */
  def bandVerdicts(docs: DataFrame, k: Int = 32, bands: Int = 8,
      shingleWidth: Int = 3, threshold: Double = 0.5,
      horizonMs: Long = 0L,
      initial: Option[KeyValueGroupedDataset[Long, Array[Byte]]] = None)
      : Dataset[BandVerdict] = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(horizonMs >= 0, s"horizonMs must be >= 0, got $horizonMs")
    val spark = docs.sparkSession
    import spark.implicits._
    val grouped = bandRows(docs, k, bands, shingleWidth).groupByKey(_.bandHash)
    val f = verdictFunc(k, threshold, horizonMs)
    initial match {
      case Some(st) => grouped.flatMapGroupsWithState[Array[Byte], BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout, st)(f)
      case None => grouped.flatMapGroupsWithState[Array[Byte], BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(f)
    }
  }

  /** The per-bucket state machine shared by the plain and bootstrapped
    * paths, over the packed byte layout. Per batch and bucket: one state
    * get (a byte-array hand-off), similarity scans directly over the
    * buffer, and one state put ONLY when the bucket actually changed —
    * a bucket that saw nothing but redundant clones (horizon disabled)
    * writes nothing, and a pure append copies bytes once without
    * re-encoding anything. */
  private def verdictFunc(k: Int, threshold: Double, horizonMs: Long)
      : (Long, Iterator[BandRow], GroupState[Array[Byte]]) => Iterator[BandVerdict] = {
    val entryBytes = Packed.entryBytes(k)
    (_: Long, it: Iterator[BandRow], state: GroupState[Array[Byte]]) => {
      // constant throughout the trigger → one clock per batch,
      // restart-safe (stamps persist with the state)
      val now = state.getCurrentProcessingTimeMs()
      val priorRaw = state.getOption.orNull
      if (priorRaw != null) {
        val priorK = Packed.kOf(priorRaw)
        if (priorK != k) throw new IllegalStateException(
          s"bucket state was packed with k=$priorK but this stream runs " +
            s"k=$k — bootstrapState and bandVerdicts must share k (and " +
            "bands); comparing signatures of different k would silently " +
            "mis-score every verdict")
      }
      // lazy horizon eviction: drop entries whose stamp aged out. Stamp 0
      // = un-stamped (bootstrap default) = exempt — see class scaladoc.
      // The filter rebuilds the array only when something actually expired.
      var old: Array[Byte] =
        if (priorRaw == null) Packed.pack(k, Nil)
        else if (horizonMs <= 0) priorRaw
        else {
          val bb = ByteBuffer.wrap(priorRaw)
          val n = Packed.count(priorRaw, k)
          var keep = 0
          var i = 0
          while (i < n) {
            val st = Packed.stampAt(bb, Packed.Header + i * entryBytes)
            if (st == 0L || now - st <= horizonMs) keep += 1
            i += 1
          }
          if (keep == n) priorRaw
          else {
            val out = ByteBuffer.allocate(Packed.Header + keep * entryBytes)
            out.putInt(k)
            i = 0
            while (i < n) {
              val off = Packed.Header + i * entryBytes
              val st = Packed.stampAt(bb, off)
              if (st == 0L || now - st <= horizonMs)
                out.put(priorRaw, off, entryBytes)
              i += 1
            }
            out.array()
          }
        }
      var changed = (priorRaw != null) && (old.length != priorRaw.length)
      var oldOwned = changed || priorRaw == null // safe to mutate in place?
      var oldBb = ByteBuffer.wrap(old)
      var oldN = Packed.count(old, k)
      // entries appended THIS batch (streamed docs are never
      // bootstrap-flagged; stamp = now)
      val fresh = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]

      def precedesOld(off: Int, docId: Long): Boolean =
        (Packed.flagsAt(oldBb, off) & Packed.FlagBootstrapPrecedes) != 0 ||
          Packed.docIdAt(oldBb, off) < docId

      // smallest match count that clears the threshold, derived with the
      // SAME double comparison the r9 code ran per entry (eq/k >= t) — a
      // bare ceil(t*k) disagrees at representation boundaries (0.7*10
      // rounds to 7.000000000000001, ceil 8, but 7/10 >= 0.7 is true)
      val minEq = (0 to k).find(e => e.toDouble / k >= threshold).getOrElse(k)

      // ascending docId makes intra-batch processing deterministic
      // (groups receive batch rows in shuffle order, not input order)
      val out = it.toArray.sortBy(_.docId).iterator.map { d =>
        if (d.sig.length != k) throw new IllegalStateException(
          s"signature length ${d.sig.length} != k=$k — bandRows and " +
            "verdictFunc disagree on k (engine bug)")
        var dup = false
        var exactOldOff = -1 // offset of an equal-sig preceding old entry
        var exactFresh = false
        var i = 0
        while (i < oldN) {
          val off = Packed.Header + i * entryBytes
          if (precedesOld(off, d.docId)) {
            val eq = Packed.matches(oldBb, off, d.sig)
            if (eq >= minEq) dup = true
            if (eq == k && exactOldOff < 0) exactOldOff = off
          }
          i += 1
        }
        var j = 0
        while (j < fresh.length) {
          val (fid, fsig) = fresh(j)
          if (fid < d.docId) {
            var eq = 0; var c = 0
            while (c < k) { if (fsig(c) == d.sig(c)) eq += 1; c += 1 }
            if (eq >= minEq) dup = true
            if (eq == k) exactFresh = true
          }
          j += 1
        }
        // in-state exact-clone collapse (the ExactCollapse lesson
        // applied to the state store): a doc whose signature is
        // IDENTICAL to an already-seen preceding entry is redundant —
        // any future doc it could suppress is already suppressed by
        // that entry. Refresh the entry's stamp instead of appending,
        // so a clone class holds ONE state entry and stays horizon-live
        // while clones keep arriving. Without this, clone-heavy streams
        // append ever-growing state per arrival: measured 7.1x wall for
        // 3.3x rows at x100 clone replication, restored to linear by the
        // collapse (STREAMDEDUP_r9.json). With the horizon DISABLED the
        // stamp is never read, so the refresh is skipped and a redundant
        // arrival leaves the bucket byte-identical. CONTRACT CORNER:
        // horizon-off checkpoints therefore carry FIRST-seen stamps for
        // clone classes; restarting the same checkpoint with a horizon
        // newly armed ages those classes by first arrival, not last.
        // Arming/raising a horizon mid-deployment is a re-bootstrap (or
        // accept the conservative extra evictions). A fresh-entry exact
        // clone needs no refresh — its class rep is already stamped now.
        if (exactOldOff >= 0 || exactFresh) {
          if (horizonMs > 0 && exactOldOff >= 0 &&
              Packed.stampAt(oldBb, exactOldOff) != now) {
            if (!oldOwned) { // copy-on-write: never mutate the store's array
              old = old.clone(); oldBb = ByteBuffer.wrap(old); oldOwned = true
            }
            oldBb.putLong(exactOldOff + 8, now)
            changed = true
          }
        } else {
          fresh += ((d.docId, d.sig))
          changed = true
        }
        BandVerdict(d.docId, dup)
      }.toArray // drain BEFORE the state write below
      if (changed) {
        val merged = ByteBuffer.allocate(
          Packed.Header + (fresh.length + oldN) * entryBytes)
        merged.putInt(k)
        // newest first, matching the r9 cons order (scan order is
        // semantically irrelevant — every entry is examined)
        fresh.foreach { case (id, sig) =>
          Packed.writeEntry(merged, id, now, 0: Byte, sig) }
        merged.put(old, Packed.Header, old.length - Packed.Header)
        state.update(merged.array())
      }
      out.iterator
    }
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
    * window matters; a clean stop commits first).
    *
    * `bootstrapPrecedesStream` (default true) forwards to
    * [[bootstrapState]]: bootstrapped history suppresses streamed
    * documents regardless of the two id spaces. `bootstrapStampMs` 0
    * leaves the bootstrap un-stamped = horizon-exempt (persists until
    * re-bootstrap); pass the bootstrap wall-clock to age it like live
    * arrivals under `horizonMs`. */
  def start(docs: DataFrame, outPath: String, checkpoint: String,
      k: Int = 32, bands: Int = 8, shingleWidth: Int = 3,
      threshold: Double = 0.5, horizonMs: Long = 0L,
      bootstrap: Option[DataFrame] = None,
      bootstrapStampMs: Long = 0L,
      bootstrapPrecedesStream: Boolean = true): StreamingQuery = {
    bandVerdicts(docs, k, bands, shingleWidth, threshold, horizonMs,
      bootstrap.map(b => bootstrapState(b, k, bands, shingleWidth,
        bootstrapStampMs, bootstrapPrecedesStream)))
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
