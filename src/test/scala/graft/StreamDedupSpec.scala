package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MinHash}
import graft.streaming.StreamDedup

/** [[graft.streaming.StreamDedup]] — streaming near-dup dedup against
  * history. The gate is an INDEPENDENT driver model: signatures and band
  * hashes are computed once in batch (the same expressions the stream
  * uses), then the keep-first predicate — drop a doc iff a doc seen in an
  * earlier batch (or same batch with smaller id; in all cases smaller id)
  * shares a band with signature similarity ≥ threshold — is replayed in
  * plain Scala over the exact batch splits fed to the stream. The stream's
  * distributed state machine must reproduce the model exactly, including
  * across a checkpoint restart.
  */
object StreamDedupSpec {
  /** top-level so both the batch toDF path and MemoryStream can derive an
    * encoder (an inner case class fails outer-scope resolution) */
  case class Doc(doc_id: Long, text: String)
}

class StreamDedupSpec extends SparkSpec {

  import spark.implicits._
  import StreamDedupSpec.Doc

  private val K = 16
  private val Bands = 4
  private val W = 3
  private val T = 0.5

  /** (sig, bands) per doc via the same batch expressions the stream uses. */
  private def sigBands(docs: Seq[Doc]): Map[Long, (Array[Long], Seq[Long])] = {
    GraftFunctions.register(spark)
    docs.toDF()
      .withColumn("sh", array_distinct(MinHash.shingles(col("text"), W)))
      .withColumn("sig", MinHash.signature(col("sh"), K))
      .withColumn("bands", MinHash.bandHashes(col("sig"), K, Bands))
      .select(col("doc_id"), col("sig"), col("bands"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toArray, r.getSeq[Long](2)))
      .toMap
  }

  private def sim(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

  /** The reference predicate replayed sequentially over the batch splits. */
  private def modelSurvivors(batches: Seq[Seq[Doc]]): Set[Long] = {
    val sb = sigBands(batches.flatten)
    val buckets = scala.collection.mutable.Map.empty[Long, List[Long]]
    val survivors = scala.collection.mutable.Set.empty[Long]
    for (batch <- batches; d <- batch.sortBy(_.doc_id)) {
      val (sig, bands) = sb(d.doc_id)
      val dup = bands.exists(b => buckets.getOrElse(b, Nil).exists(o =>
        o < d.doc_id && sim(sb(o)._1, sig) >= T))
      bands.foreach(b => buckets(b) = d.doc_id :: buckets.getOrElse(b, Nil))
      if (!dup) survivors += d.doc_id
    }
    survivors.toSet
  }

  /** Run the real stream over the batch splits, one micro-batch per split;
    * returns surviving doc_ids from the parquet sink. */
  private def streamSurvivors(batches: Seq[Seq[Doc]],
      horizonMs: Long = 0L): Set[Long] = {
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T,
      horizonMs = horizonMs)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    } finally q.stop()
  }

  /** Small deterministic corpus factory: base docs, near-dups (1-word
    * mutation of a base), exact clones, novel docs. */
  private def word(i: Int) = s"w$i"
  private def baseText(seed: Int, len: Int): String = {
    val r = new scala.util.Random(seed)
    Seq.fill(len)(word(r.nextInt(20))).mkString(" ")
  }
  private def mutate(text: String, seed: Int): String = {
    val r = new scala.util.Random(seed)
    val ws = text.split(" ")
    ws.updated(r.nextInt(ws.length), word(20 + r.nextInt(5))).mkString(" ")
  }

  test("cross-batch drops: near-dup and exact clone of earlier docs fall, " +
      "novel docs survive; stream ≡ model") {
    val d0 = Doc(0, baseText(1, 20))
    val d1 = Doc(1, baseText(2, 18))
    val batches = Seq(
      Seq(d0, d1),
      Seq(Doc(2, mutate(d0.text, 3)),  // near-dup of d0 → drop
          Doc(3, d1.text),             // exact clone of d1 → drop
          Doc(4, baseText(9, 22))))    // novel → keep
    val got = streamSurvivors(batches)
    assert(got == Set(0L, 1L, 4L), got)
    assert(got == modelSurvivors(batches))
  }

  test("fuzz: random corpora and batch splits — stream ≡ driver model " +
      "(10 seeded cases)") {
    for (seed <- 1 to 10) {
      val r = new scala.util.Random(seed)
      val nBase = 6 + r.nextInt(6)
      val base = (0 until nBase).map(i =>
        (i.toLong, baseText(seed * 100 + i, 12 + r.nextInt(12))))
      var nextId = nBase.toLong
      val derived = base.flatMap { case (_, t) =>
        val copies = r.nextInt(3) // 0-2 derivatives per base
        (0 until copies).map { c =>
          val id = nextId; nextId += 1
          Doc(id, if (r.nextBoolean()) t
                  else mutate(t, seed * 1000 + id.toInt))
        }
      }
      val all = r.shuffle(base.map { case (i, t) => Doc(i, t) } ++ derived)
      // random split into 1-4 batches, preserving the shuffled order
      val nb = 1 + r.nextInt(4)
      val batches = all.grouped(math.max(1, (all.size + nb - 1) / nb)).toSeq
      val got = streamSurvivors(batches)
      val want = modelSurvivors(batches)
      assert(got == want,
        s"seed=$seed batches=${batches.map(_.map(_.doc_id))}: " +
          s"stream=$got model=$want")
    }
  }

  test("checkpoint restart: state survives; resumed run equals the " +
      "uninterrupted one") {
    val d0 = Doc(0, baseText(42, 20))
    val b1 = Seq(d0, Doc(1, baseText(43, 20)))
    val b2 = Seq(Doc(2, mutate(d0.text, 44)), Doc(3, baseText(45, 20)))
    val oneShot = streamSurvivors(Seq(b1, b2))

    val tmp = Files.createTempDirectory("graft-sdedup-rs").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q1 = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T)
    input.addData(b1); q1.processAllAvailable(); q1.stop()
    val q2 = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T)
    try {
      input.addData(b2); q2.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // doc 2 is a near-dup of PRE-RESTART doc 0: only restored bucket
      // state can drop it
      assert(!got.contains(2L), got)
      assert(got == oneShot, s"restart=$got oneShot=$oneShot")
    } finally q2.stop()
  }

  test("horizonMs: an idle bucket forgets its history; without a horizon " +
      "the same near-dup drops") {
    val d0 = Doc(0, baseText(7, 20))
    val dup = Doc(1, mutate(d0.text, 8))
    assert(streamSurvivors(Seq(Seq(d0), Seq(dup))) == Set(0L))
    // horizon 300 ms, 1.5 s idle: eviction is LAZY — the dup's own access
    // to d0's buckets filters the expired entries before the similarity
    // check, so no intermediate trigger is needed (and the operator never
    // arms engine timeouts — see the StreamDedup scaladoc on the no-data
    // micro-batch busy loop they cause)
    val tmp = Files.createTempDirectory("graft-sdedup-hz").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T,
      horizonMs = 300L)
    try {
      input.addData(Seq(d0)); q.processAllAvailable()
      Thread.sleep(1500)
      input.addData(Seq(dup)); q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(0L, 1L), got) // forgotten history: near-dup kept
    } finally q.stop()
  }

  test("horizonMs: a redundant exact clone REFRESHES its class's stamp — " +
      "the clone class stays live past the original's own horizon") {
    // the in-state clone collapse keeps ONE entry per clone class and, with
    // a horizon armed, must refresh its stamp on every clone arrival (the
    // class is still "being seen"); with the horizon DISABLED the stamp is
    // never read and a redundant arrival skips the state write entirely —
    // this test pins the armed-horizon half of that contract. Margins are
    // wide (sleeps 6 s vs horizon 10 s) so slow batches can't flake it.
    val hz = 10000L
    val d0 = Doc(0, baseText(11, 20))
    val clone = Doc(1, d0.text) // exact clone → redundant in-state
    val near = Doc(2, mutate(d0.text, 9)) // near-dup of the class
    val tmp = Files.createTempDirectory("graft-sdedup-refresh").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T,
      horizonMs = hz)
    try {
      input.addData(Seq(d0)); q.processAllAvailable()
      Thread.sleep(6000)
      input.addData(Seq(clone)); q.processAllAvailable() // refresh at ~6 s
      Thread.sleep(6000)
      // ~12 s after d0 (past its horizon), ~6 s after the refresh (within):
      // only the refreshed stamp can drop the near-dup
      input.addData(Seq(near)); q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(0L), got) // clone dropped AND near-dup dropped
    } finally q.stop()
  }

  test("null text never reaches the state rows: empties dedup among " +
      "themselves, keep-first retains one") {
    val tmp = Files.createTempDirectory("graft-sdedup-null").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.lang.Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamDedup.start(docs, s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T)
    try {
      input.addData(Seq((0L: java.lang.Long, null),
        (1L: java.lang.Long, baseText(5, 15))))
      q.processAllAvailable()
      input.addData(Seq((2L: java.lang.Long, null))) // cross-batch empty dup
      q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(0L, 1L), got) // doc 2 = exact dup of the null class
    } finally q.stop()
  }

  test("bootstrapState ≡ replaying the corpus as earlier batches (stream " +
      "AND independent model agree); verdicts only cover streamed docs") {
    // corpus: bases + clones + near-dups among themselves; stream: a mix of
    // novel docs, exact clones of corpus docs, and near-dups of corpus docs
    val corpus = Seq(
      Doc(0, baseText(1, 20)), Doc(1, baseText(2, 20)),
      Doc(2, baseText(1, 20)), // exact clone inside the corpus
      Doc(3, mutate(baseText(2, 20), 5)))
    val b1 = Seq(Doc(10, baseText(1, 20)), // exact clone of corpus 0
      Doc(11, baseText(9, 20))) // novel
    val b2 = Seq(Doc(12, mutate(baseText(1, 20), 6)), // near-dup of corpus 0
      Doc(13, mutate(baseText(9, 20), 7)), // near-dup of b1's novel doc
      Doc(14, baseText(3, 20))) // novel
    val streamIds = (b1 ++ b2).map(_.doc_id).toSet
    // reference 1: the plain stream with the corpus replayed as batch 0
    val replay = streamSurvivors(Seq(corpus, b1, b2)).intersect(streamIds)
    // reference 2: the independent driver model, same restriction
    val model = modelSurvivors(Seq(corpus, b1, b2)).intersect(streamIds)
    assert(replay == model, s"replay=$replay model=$model")
    // the bootstrapped stream sees ONLY b1/b2 as data
    val tmp = Files.createTempDirectory("graft-sdedup-boot").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T,
      bootstrap = Some(corpus.toDF()))
    val got = try {
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    } finally q.stop()
    assert(got == model, s"bootstrapped=$got model=$model")
    // no corpus id ever reaches the sink — the bootstrap is state, not data
    assert(got.subsetOf(streamIds), got)
  }

  test("bootstrap binds on batch 0 only: a restart from checkpoint keeps " +
      "the evolved store without re-supplying the corpus") {
    val corpus = Seq(Doc(0, baseText(4, 20)))
    val novel = Doc(10, baseText(8, 20))
    val tmp = Files.createTempDirectory("graft-sdedup-bootrs").toString
    implicit val sqlCtx = spark.sqlContext
    val in1 = MemoryStream[Doc]
    val q1 = StreamDedup.start(in1.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T,
      bootstrap = Some(corpus.toDF()))
    try { in1.addData(Seq(novel)); q1.processAllAvailable() } finally q1.stop()
    // restart WITHOUT a bootstrap: both the corpus doc (from the initial
    // state) and the pre-restart streamed doc must still suppress dups
    val in2 = MemoryStream[Doc]
    in2.addData(Seq(novel)) // replay source contract: offsets restart at 0
    val q2 = StreamDedup.start(in2.toDF(), s"$tmp/out", s"$tmp/ck",
      k = K, bands = Bands, shingleWidth = W, threshold = T)
    val got = try {
      in2.addData(Seq(
        Doc(20, mutate(corpus.head.text, 3)), // near-dup of bootstrap doc
        Doc(21, novel.text), // exact clone of pre-restart doc
        Doc(22, baseText(6, 20)))) // novel
      q2.processAllAvailable()
      spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    } finally q2.stop()
    assert(got == Set(10L, 22L), got)
  }

  test("bootstrap stamps interact with the horizon: pre-aged corpus " +
      "entries are already expired, fresh ones suppress") {
    val hz = 60000L // one minute — no sleeps, stamps are pre-aged instead
    val c = Seq(Doc(0, baseText(12, 20)))
    // EXACT clone: similarity 1.0 collides in every band, so survival can
    // only mean eviction (a planted near-dup may legitimately never
    // band-collide under a given hash draw — that's LSH, not a bug)
    val dup = Doc(10, c.head.text)
    def run(stamp: Long): Set[Long] = {
      val tmp = Files.createTempDirectory("graft-sdedup-boothz").toString
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Doc]
      val q = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
        k = K, bands = Bands, shingleWidth = W, threshold = T,
        horizonMs = hz, bootstrap = Some(c.toDF()), bootstrapStampMs = stamp)
      try {
        input.addData(Seq(dup)); q.processAllAvailable()
        spark.read.parquet(s"$tmp/out").select("doc_id")
          .collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    assert(run(System.currentTimeMillis()) == Set.empty[Long]) // live → drop
    assert(run(System.currentTimeMillis() - 2 * hz) == Set(10L)) // aged out
    // stamp 0 = UN-STAMPED = horizon-exempt (r10): the default bootstrap
    // persists under an armed horizon instead of silently expiring on each
    // bucket's first access (the r9 hazard its start() require guarded)
    assert(run(0L) == Set.empty[Long])
  }

  test("bootstrap precedence: history suppresses a stream whose ids sit AT " +
      "OR BELOW the corpus ids (advice r9 — the deploy-against-history " +
      "shape must not depend on id spaces)") {
    // corpus ids HIGH (500+), stream ids LOW (0..2) — under the r9
    // keep-first-by-id predicate the whole bootstrap would no-op here
    val cText = baseText(21, 20)
    val corpus = Seq(Doc(500, cText), Doc(501, baseText(22, 20)))
    def run(precedes: Boolean): Set[Long] = {
      val tmp = Files.createTempDirectory("graft-sdedup-prec").toString
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Doc]
      val q = StreamDedup.start(input.toDF(), s"$tmp/out", s"$tmp/ck",
        k = K, bands = Bands, shingleWidth = W, threshold = T,
        bootstrap = Some(corpus.toDF()), bootstrapPrecedesStream = precedes)
      try {
        input.addData(Seq(
          Doc(0, cText),               // exact clone of corpus 500
          Doc(1, mutate(cText, 23)),   // near-dup of corpus 500
          Doc(2, baseText(29, 20))))   // novel
        q.processAllAvailable()
        spark.read.parquet(s"$tmp/out").select("doc_id")
          .collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    // default: bootstrap entries precede ANY streamed doc → clones dropped
    val got = run(precedes = true)
    assert(got.contains(2L) && !got.contains(0L), got)
    // near-dup 1 drops iff its bands collide under this hash draw — but it
    // must ALSO match the opt-out delta below, so pin only the exact clone
    // opt-out (r9 semantics): same-id-space keep-first → corpus ids 500+
    // cannot suppress stream ids 0..2, every streamed doc survives except
    // intra-stream dups (doc 1 may drop against doc 0's identical-class sig)
    val legacy = run(precedes = false)
    assert(legacy.contains(0L) && legacy.contains(2L), legacy)
  }

  test("rejections: threshold range, horizon sign, band divisibility") {
    val df = Seq(Doc(0, "a b c")).toDF()
    assert(intercept[IllegalArgumentException] {
      StreamDedup.bandVerdicts(df, threshold = 0.0)
    }.getMessage.contains("threshold"))
    assert(intercept[IllegalArgumentException] {
      StreamDedup.bandVerdicts(df, horizonMs = -1L)
    }.getMessage.contains("horizonMs"))
    assert(intercept[IllegalArgumentException] {
      StreamDedup.bandVerdicts(df, k = 16, bands = 5)
    }.getMessage.contains("bands"))
    // (the packed-state k header guard is defense in depth: a k mismatch
    // between bootstrap and stream also changes the band-hash keyspace, so
    // the two nearly never share a bucket for the guard to fire in — keep
    // k AND bands identical between bootstrap and stream, as start() does
    // by construction)
  }

  test("batch execution: bandVerdicts + survivorIds on a plain DataFrame " +
      "equals the single-batch model (the driver-visible correctness path)") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(100 + seed)
      val base = (0 until 8).map(i =>
        Doc(i.toLong, baseText(seed * 77 + i, 12 + r.nextInt(10))))
      val derived = base.zipWithIndex.flatMap { case (d, i) =>
        if (i % 2 == 0) Seq(Doc(100 + i, d.text),
          Doc(200 + i, mutate(d.text, seed * 31 + i)))
        else Nil
      }
      val all = base ++ derived
      val got = StreamDedup.survivorIds(
        StreamDedup.bandVerdicts(all.toDF(), k = K, bands = Bands,
          shingleWidth = W, threshold = T).toDF())
        .collect().map(_.getLong(0)).toSet
      val want = modelSurvivors(Seq(all))
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }
}
