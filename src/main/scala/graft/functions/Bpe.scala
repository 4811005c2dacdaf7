package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING (Sennrich et al. 2016,
  * the merge loop behind BPE/GPT-style tokenizers) as exact, oracle-checkable
  * relational rounds.
  *
  * Representation is the whole trick: a word's segmentation is one string
  * with every token wrapped in `·` sentinels — `"low"` → `"·l··o··w·"`. A
  * merge of the pair (a, b) is then the PLAIN string replace
  * `"·a··b·"` → `"·ab·"`, which is
  *  - boundary-safe: a pair can never match across tokens or inside a longer
  *    token (the sentinel dots around each token don't line up), and
  *  - overlap-safe: consecutive occurrences `"·a··b··a··b·"` each own their
  *    boundary dots, so left-to-right non-overlapping replace (the semantics
  *    of BOTH Spark's and DuckDB's `replace`) merges every occurrence, same
  *    as the reference implementation's regex pass.
  * The sentinel is U+00B7 — absent from the corpus (ASCII words); production
  * would pick an out-of-alphabet byte the same way.
  *
  * Scale shape (the BPE trick, same as `bpe_pair_counts`): the corpus
  * collapses ONCE to the vocabulary-sized (word, freq) table; every training
  * round is a pair-count aggregation + driver argmax + one column replace
  * over that SMALL table — never over the corpus. Encoding applies the
  * trained merges as k chained codegen'd `replace`s per row.
  */
object Bpe {

  /** chars of `word` wrapped in sentinels: "low" → "·l··o··w·".
    * Spark's `split` keeps a TRAILING empty match on an empty pattern
    * (Java `split(regex, -1)`), which would smuggle an empty token into
    * every word — filter it. */
  def dotted(word: Column): Column =
    concat(lit("·"),
      array_join(filter(split(word, ""), c => c =!= lit("")), "··"),
      lit("·"))

  /** tokens of a dotted segmentation string. */
  def tokens(s: Column): Column = split(trim(s, "·"), "··")

  /** adjacent token pairs of a dotted segmentation, each rendered
    * "a··b" (tokens never contain `·`, so the rendering is unambiguous). */
  def adjacentPairs(s: Column): Column = {
    val t = tokens(s)
    val n = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => concat(a, lit("··"), b))
  }

  /** One trained merge: the pair rendered "a··b" and its weighted count. */
  final case class Merge(step: Int, pair: String, cnt: Long) {
    def a: String = pair.split("··")(0)
    def b: String = pair.split("··")(1)
    /** the replace this merge performs on a dotted segmentation */
    def from: String = s"·${pair}·"
    def to: String = "·" + pair.replace("··", "") + "·"
  }

  /** Train `k` merges over a (word, freq) vocabulary table. Deterministic
    * argmax: count DESC, pair ASC — the tiebreak every reimplementation
    * needs pinned for reproducible vocabularies. Stops early when no pair
    * remains. Each round runs over the vocabulary-sized table only. */
  def train(vocab: DataFrame, wordCol: String, freqCol: String, k: Int)
      : Seq[Merge] = {
    var segs = vocab.select(col(freqCol).cast("long").as("freq"),
      dotted(col(wordCol)).as("s"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val top = segs
        .select(col("freq"), explode(adjacentPairs(col("s"))).as("p"))
        .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("p").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val m = Merge(step, top(0).getString(0), top(0).getLong(1))
        merges += m
        segs = segs.withColumn("s", replace(col("s"), lit(m.from), lit(m.to)))
        step += 1
      }
    }
    merges.toSeq
  }

  /** Apply trained merges to a dotted segmentation column: k chained plain
    * replaces (codegen'd; the merge list is a plan literal). */
  def applyMerges(s: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(s)((c, m) => replace(c, lit(m.from), lit(m.to)))

  /** Encoded token count of `word` under `merges`. */
  def tokenCount(word: Column, merges: Seq[Merge]): Column =
    size(tokens(applyMerges(dotted(word), merges)))
}
