package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GearChunks, GraftFunctions}

/** The compiled [[GearChunks]] CDC kernel vs the original higher-order-
  * function formulation it replaced: chunk-for-chunk equality, partition
  * invariants, the content-anchored-boundary property, and the FastCDC
  * min/max clamps. The HOF twin lives HERE (verbatim copy of the old
  * `cdcChunkFrame` stages) so the promotion can never silently drift —
  * the DuckDB oracles of cdc_chunk_stats / cdc_containment_pairs pin the
  * same semantics end-to-end at the query level. */
class GearChunksSpec extends SparkSpec {

  /** The pre-promotion formulation: per-char gear array, windowed boundary
    * filter, per-chunk substr (each stage its own projection — see the old
    * cdcChunkFrame comment for why). */
  private def hofChunks(df: DataFrame): DataFrame = {
    val t = col("text")
    df.withColumn("__len", length(t))
      .withColumn("__gs", transform(filter(split(t, ""), c => c =!= lit("")),
        c => ascii(c) * lit(167) + lit(13)))
      .withColumn("__bnd", when(col("__len") >= 7,
        filter(sequence(lit(6), col("__len") - 1), i =>
          (element_at(col("__gs"), i - 5) * 32 +
            element_at(col("__gs"), i - 4) * 16 +
            element_at(col("__gs"), i - 3) * 8 +
            element_at(col("__gs"), i - 2) * 4 +
            element_at(col("__gs"), i - 1) * 2 +
            element_at(col("__gs"), i)) % 64 === 0))
        .otherwise(array().cast("array<int>")))
      .withColumn("chunks", {
        val bnd = col("__bnd")
        transform(sequence(lit(1), size(bnd) + 1), k => {
          val start = when(k === 1, lit(1))
            .otherwise(element_at(bnd, k - 1) + 1)
          val end = when(k === size(bnd) + 1, col("__len"))
            .otherwise(element_at(bnd, k))
          t.substr(start, end - start + 1)
        })
      })
      .select(col("id"), col("chunks"))
  }

  private def gearDf(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  private def chunksOf(df: DataFrame, c: Column): Map[Long, Seq[String]] =
    df.select(col("id"), c.as("chunks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap

  // deterministic corpus: printable-ASCII pseudo-random docs across the
  // length ladder, incl. the boundary-test edge lengths around the 6-char
  // window, plus repetitive and whitespace-heavy shapes
  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val lens = Seq(0, 1, 5, 6, 7, 8, 13, 63, 64, 65, 200, 1000, 5000)
    val rand = lens.map(L => (0 until L).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    val shaped = Seq(
      "a" * 500,                          // constant run: periodic boundaries
      ("the quick brown fox " * 40).trim, // natural-ish text
      " \t\n" * 100,                      // whitespace soup
      "ab" * 300, "abcdefg" * 77)
    rand ++ shaped
  }

  test("compiled kernel ≡ HOF formulation, chunk for chunk, over the corpus") {
    val df = gearDf(corpus)
    val got = chunksOf(df, GearChunks(col("text"), mask = 64))
    val want = chunksOf(hofChunks(df), col("chunks"))
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) assert(got(id) == w, s"doc $id diverged")
  }

  test("BMP unicode: codepoint positions agree with the HOF twin") {
    val texts = Seq("héllo wörld — ünïcode £¥€ " * 30,
      "καλημέρα κόσμε " * 40, "日本語のテキストです。" * 25)
    val df = gearDf(texts)
    val got = chunksOf(df, GearChunks(col("text"), mask = 64))
    val want = chunksOf(hofChunks(df), col("chunks"))
    for ((id, w) <- want) assert(got(id) == w, s"doc $id diverged")
  }

  test("chunks partition the text exactly; empty text yields one empty chunk") {
    val df = gearDf(corpus)
    val got = chunksOf(df, GearChunks(col("text"), mask = 64))
    for ((t, i) <- corpus.zipWithIndex) {
      assert(got(i.toLong).mkString == t, s"doc $i lost characters")
      assert(got(i.toLong).nonEmpty)
      if (t.nonEmpty) assert(got(i.toLong).forall(_.nonEmpty), s"doc $i empty chunk")
    }
    assert(got(corpus.indexWhere(_.isEmpty).toLong) == Seq(""))
  }

  test("boundaries are content-anchored: a prefix insertion re-syncs chunks") {
    // insert 3 chars at the front of a 5000-char doc: all but the first few
    // chunks must be IDENTICAL strings (that's the whole point of CDC vs
    // fixed-size blocks, which would all shift)
    val base = corpus.last * 8 // ~4.3k chars
    val df = gearDf(Seq(base, "XYZ" + base))
    val got = chunksOf(df, GearChunks(col("text"), mask = 64))
    val a = got(0L).toSet
    val b = got(1L).toSet
    val shared = a.intersect(b).size
    assert(shared >= a.size - 3, s"only $shared of ${a.size} chunks survived the shift")
  }

  test("FastCDC clamps: minLen suppresses cuts, maxLen forces them, min=max=0 is the plain form") {
    val texts = corpus.filter(_.length >= 200)
    val df = gearDf(texts)
    val plain = chunksOf(df, GearChunks(col("text"), mask = 64))
    val clamped = chunksOf(df, GearChunks(col("text"), mask = 64, minLen = 32, maxLen = 128))
    for ((id, cs) <- clamped) {
      assert(cs.mkString == texts(id.toInt), s"doc $id lost characters under clamps")
      // every chunk except possibly the last respects [minLen, maxLen]
      for (c <- cs.dropRight(1)) {
        assert(c.length >= 32, s"doc $id: chunk below minLen (${c.length})")
        assert(c.length <= 128, s"doc $id: chunk above maxLen (${c.length})")
      }
      assert(cs.last.length <= 128, s"doc $id: last chunk above maxLen")
    }
    val unclamped = chunksOf(df, GearChunks(col("text"), mask = 64, minLen = 0, maxLen = 0))
    assert(unclamped == plain)
  }

  test("SQL surface: gear_chunks arg validation and literal requirements") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val one = Seq(("x" * 100)).toDF("text")
    one.createOrReplaceTempView("gear_one")
    // 1-arg default mask 64 ≡ explicit
    val d = spark.sql("SELECT gear_chunks(text) AS c FROM gear_one").collect()
      .head.getSeq[String](0)
    val e = spark.sql("SELECT gear_chunks(text, 64) AS c FROM gear_one").collect()
      .head.getSeq[String](0)
    assert(d == e)
    // non-power-of-two mask and minLen-without-maxLen fail loudly
    val ex1 = intercept[Exception](
      spark.sql("SELECT gear_chunks(text, 63) FROM gear_one").collect())
    assert(ex1.getMessage.contains("power of two"), ex1.getMessage)
    val ex2 = intercept[Exception](
      spark.sql("SELECT gear_chunks(text, 64, 10) FROM gear_one").collect())
    assert(ex2.getMessage.contains("together"), ex2.getMessage)
    // null text → null out (not a crash)
    assert(spark.sql("SELECT gear_chunks(CAST(NULL AS STRING))").collect().head.isNullAt(0))
  }
}
