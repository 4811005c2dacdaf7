package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** [EXT] The native [[graft.functions.RepetitionSignals]] expression (r9)
  * must be row-identical to the r8 relational formulation it replaced —
  * on the real corpus AND on planted edge cases that stress exactly where
  * a per-doc reimplementation can drift: tie-breaks among equal-count
  * grams (binary-largest gram wins), repeated blocks straddling n sizes,
  * docs shorter than n, single-word docs, and empty tokens from doubled
  * spaces (split keeps them; gc must not count them).
  */
class RepetitionParitySpec extends SparkSpec {

  private def byDoc(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

  test("expression ≡ relational twin on the sf0.001 corpus") {
    val q = TextQueries.all.find(_.name == "gopher_repetition_signals").get
    val expr = byDoc(q.run(spark, "/root/testdata/sf0.001"))
    val rel = byDoc(TextQueries.gopherRepetitionRelational(
      graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")))
    assert(expr == rel)
  }

  test("expression ≡ relational twin on planted edge cases") {
    graft.functions.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val docs = Seq(
      // tie among bigrams "b a" and "a b" (both twice): binary-largest wins
      1L -> "a b a b a",
      // heavy repetition: one block repeated 4x (hits every n in 2..10)
      2L -> (Seq.fill(4)("x y z w v u t s q r").mkString(" ")),
      // shorter than most n: 3 words (n=4..10 must be 0)
      3L -> "k k k",
      // single word: every signal 0
      4L -> "solo",
      // doubled spaces -> empty tokens; gc counts non-space chars only
      5L -> "p  q p  q p",
      // equal-count grams with DIFFERENT char lengths: tie-break changes
      // top_chars, so ordering must match exactly
      6L -> "aa b aa b cc d cc d",
      // unicode multi-byte words (UTF8 binary order vs UTF-16 matters)
      7L -> "é z é z ¢ y ¢ y",
      // long uniform run: n-gram counts all equal, max gram well-defined
      8L -> Seq.fill(30)("m").mkString(" ")
    ).toDF("doc_id", "text")
    // the SHARED threshold/keep definitions (TextQueries.gopher*): this
    // spec must drift together with the shipped query, not keep passing
    // against a private copy (review r9)
    val keepCols = TextQueries.gopherSignalNames
    val keep = TextQueries.gopherKeep
    val expr = byDoc(docs
      .select(col("doc_id"),
        length(translate(col("text"), " ", "")).cast("long").as("total_chars"),
        call_function("repetition_signals", split(col("text"), " ")).as("r"))
      .select(Seq(col("doc_id"), col("total_chars")) ++
        keepCols.map(c => col(s"r.$c").as(c)): _*)
      .withColumn("keep_repetition", keep.cast("int")))
    val rel = byDoc(TextQueries.gopherRepetitionRelational(docs))
    assert(expr == rel, s"\nexpr: ${expr.toSeq.sortBy(_._1)}\nrel:  ${rel.toSeq.sortBy(_._1)}")
    // sanity on the planted tie case: doc1's bigrams "a b" (x2) and
    // "b a" (x2) tie; "b a" is binary-larger, both are 2 chars -> 2*2=4
    assert(expr(1L).apply(1) == 4L)
  }
}
