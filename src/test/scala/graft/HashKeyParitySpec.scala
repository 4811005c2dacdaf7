package graft

import graft.queries.TextQueries

/** [EXT] The ×100 hashed-key levers are DEFAULT-ON since r9 and must be
  * OUTPUT-IDENTICAL to their string-key audit paths (modulo 64-bit
  * collisions, absent on these corpora): the default bigram score join
  * runs on xxhash64(w1,w2) and `spark.graft.bigram.stringJoinKey=true`
  * restores the literal-string join. Parity is pinned in BOTH directions
  * — default-vs-string here, and the same string run compared back
  * against a re-run of the default (catches conf leakage between runs).
  * The span-dedup twin lives in SpanDedupSpec.
  */
class HashKeyParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bigram_logprob_scores: hashed default is row-identical to the string audit path, both directions") {
    val q = TextQueries.all.find(_.name == "bigram_logprob_scores").get
    val hashed = q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    spark.conf.set("spark.graft.bigram.stringJoinKey", "true")
    val plain =
      try q.run(spark, dir).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      finally spark.conf.unset("spark.graft.bigram.stringJoinKey")
    assert(hashed == plain)
    // reverse direction: the default re-run (post-unset) matches the
    // string result — the flag must not leak into later executions
    val hashedAgain = q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(hashedAgain == plain)
  }

  test("line_dedup_stats: hashed line key (r11 default) is row-identical to the string audit path, both directions") {
    val q = TextQueries.all.find(_.name == "line_dedup_stats").get
    val hashed = q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    spark.conf.set("spark.graft.lineDedup.stringKey", "true")
    val plain =
      try q.run(spark, dir).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      finally spark.conf.unset("spark.graft.lineDedup.stringKey")
    assert(hashed == plain)
    val hashedAgain = q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(hashedAgain == plain)
  }
}
