package graft

import graft.queries.TextQueries

/** [EXT] The ×100 hashed-key levers must be OUTPUT-IDENTICAL to their
  * oracle-exact string-key defaults (modulo 64-bit collisions, absent on
  * these corpora): `spark.graft.bigram.hashJoinKey` swaps the bigram score
  * join onto xxhash64(w1,w2); the span-dedup twin lives in SpanDedupSpec.
  */
class HashKeyParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bigram_logprob_scores: hashJoinKey=true is row-identical to the string join") {
    val q = TextQueries.all.find(_.name == "bigram_logprob_scores").get
    val plain = q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    spark.conf.set("spark.graft.bigram.hashJoinKey", "true")
    try {
      val hashed = q.run(spark, dir).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(hashed == plain)
    } finally spark.conf.unset("spark.graft.bigram.hashJoinKey")
  }
}
