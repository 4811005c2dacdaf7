package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

import graft.queries.TextQueries

/** [EXT] Exact-substring span dedup (Lee et al. 2021 removal semantics at
  * word granularity, W=10): keep-first global ranking by (doc_id, pos),
  * overlapping AND adjacent duplicated windows merge into one maximal span,
  * a fully-duplicated doc keeps its row (kept_tokens=0, NULL digest), and
  * the rewrite digest matches an independently computed md5.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("span_dedup").toString
    val a = words("a", 12)               // unique 12 words
    val run = words("x", 10)             // the shared 10-gram
    val doc2 = run + " " + words("t", 5) // first occurrence (doc_id order)
    val doc3 = words("p", 4) + " " + run // later occurrence -> marked
    val rep = words("y", 10)
    val doc4 = rep + " " + rep           // internal exact repeat
    val block = words("q", 20)
    val doc5 = block                     // first copy survives untouched
    val doc6 = block                     // identical doc: fully duplicated
    val df = Seq(
      (1L, a), (2L, doc2), (3L, doc3), (4L, doc4), (5L, doc5), (6L, doc6)
    ).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "length(text) AS n_chars")
    df.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def byDoc(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

  test("stats: keep-first, internal repeat, adjacency merge to one maximal span") {
    val stats = byDoc(
      TextQueries.all.find(_.name == "span_dedup_stats").get.run(spark, dir))
    assert(stats(1L) == Seq(12L, 0L, 0L, 0.0))           // unique doc
    assert(stats(2L) == Seq(15L, 0L, 0L, 0.0))           // first occurrence survives
    assert(stats(3L) == Seq(14L, 1L, 10L, 0.71429))      // later occurrence marked
    assert(stats(4L) == Seq(20L, 1L, 10L, 0.5))          // internal repeat: 2nd copy
    // doc5 vs doc6: identical 20-word docs. doc5 wins every gram's rank-1;
    // doc6's 11 marked windows (pos 0..10) merge into ONE [0, 20) span.
    assert(stats(5L) == Seq(20L, 0L, 0L, 0.0))
    assert(stats(6L) == Seq(20L, 1L, 20L, 1.0))
  }

  test("clean: rewrite drops exactly the spans; fully-duplicated doc keeps a NULL-digest row") {
    val clean = byDoc(
      TextQueries.all.find(_.name == "span_dedup_clean").get.run(spark, dir))
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(clean(1L) == Seq(12L, 12L, md5hex(words("a", 12))))
    assert(clean(2L) == Seq(15L, 15L, md5hex(words("x", 10) + " " + words("t", 5))))
    // doc3 keeps only its 4-word prefix
    assert(clean(3L) == Seq(14L, 4L, md5hex(words("p", 4))))
    // doc4 keeps the first copy of the repeated block
    assert(clean(4L) == Seq(20L, 10L, md5hex(words("y", 10))))
    assert(clean(5L) == Seq(20L, 20L, md5hex(words("q", 20))))
    assert(clean(6L) == Seq(20L, 0L, null))               // fully duplicated
  }

  test("hashed gram key (the r9 default) is row-identical to the string audit path, both directions") {
    val stats = TextQueries.all.find(_.name == "span_dedup_stats").get
    val cleanQ = TextQueries.all.find(_.name == "span_dedup_clean").get
    val hashed = (byDoc(stats.run(spark, dir)), byDoc(cleanQ.run(spark, dir)))
    spark.conf.set("spark.graft.spanDedup.stringGramKey", "true")
    val plain =
      try (byDoc(stats.run(spark, dir)), byDoc(cleanQ.run(spark, dir)))
      finally spark.conf.unset("spark.graft.spanDedup.stringGramKey")
    assert(hashed == plain)
    // reverse direction: default re-run after the unset still matches
    val hashedAgain = (byDoc(stats.run(spark, dir)), byDoc(cleanQ.run(spark, dir)))
    assert(hashedAgain == plain)
  }
}
