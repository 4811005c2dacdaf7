package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE training/encoding laws on the classic Sennrich et al. (2016) §3.2
  * example vocabulary — hand-computed merge sequence, deterministic
  * tiebreak, ordered application, early stop. The corpus-scale twin is the
  * `bpe_train_merges` / `bpe_token_counts` oracle pair. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vocab = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "freq")

  test("merge sequence follows (cnt DESC, pair ASC): the hand-computed " +
      "Sennrich example, ties broken lexicographically") {
    val merges = Bpe.train(vocab, "word", "freq", 4)
    // round 1: es=9 ties st=9 → "e··s" < "s··t"; round 2: est=9;
    // round 3: lo=7 ties ow=7 → "l··o"; round 4: low=7
    assert(merges.map(m => (m.step, m.pair, m.cnt)) == Seq(
      (1, "e··s", 9L), (2, "es··t", 9L), (3, "l··o", 7L), (4, "lo··w", 7L)))
  }

  test("encoding applies merges IN TRAINING ORDER; token counts match the " +
      "hand computation; words untouched by merges stay character-split") {
    val merges = Bpe.train(vocab, "word", "freq", 4)
    val counts = vocab
      .select(col("word"), Bpe.tokenCount(col("word"), merges).as("n"))
      .as[(String, Int)].collect().toMap
    // low → [low]; lower → [low,e,r]; newest → [n,e,w,est]; widest → [w,i,d,est]
    assert(counts == Map("low" -> 1, "lower" -> 3, "newest" -> 4, "widest" -> 4))
    val unseen = Seq(("zap", 1L)).toDF("word", "freq")
      .select(Bpe.tokenCount(col("word"), merges).as("n")).as[Int].head()
    assert(unseen == 3)
  }

  test("training stops early when no adjacent pair remains (all-singleton " +
      "vocabulary), and k=0 trains nothing") {
    val singles = Seq(("a", 3L), ("b", 1L)).toDF("word", "freq")
    assert(Bpe.train(singles, "word", "freq", 5).isEmpty)
    assert(Bpe.train(vocab, "word", "freq", 0).isEmpty)
  }

  test("merged tokens are multi-char atoms: a later round pairs them as " +
      "units, never re-splitting (the dotted representation's invariant)") {
    // after es+est, widest segments as [w,i,d,est]; the pair "d··est"
    // exists and "s··t" no longer does
    val merges2 = Bpe.train(vocab, "word", "freq", 2)
    val segs = vocab.filter(col("word") === "widest")
      .select(Bpe.tokens(Bpe.applyMerges(Bpe.dotted(col("word")), merges2))
        .as("t")).as[Seq[String]].head()
    assert(segs == Seq("w", "i", "d", "est"))
  }
}
