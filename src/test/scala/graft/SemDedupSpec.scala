package graft

import org.apache.spark.sql.functions._

import graft.functions.SemDedup

/** [EXT] SemDeDup semantics: within-cluster pair graph → components →
  * min-id survivors; exact-dup recall 1 through the learned-cluster path;
  * the cluster boundary is a hard wall (documented SemDeDup caveat).
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("within-cluster chain collapses to one survivor; unpaired rows survive") {
    // cluster 0: a≈b≈c chain (transitive component), d orthogonal
    // cluster 1: e alone
    val df = Seq(
      (1L, vec(1, 0, 0, 0), 0),
      (2L, vec(0.999, 0.01, 0, 0), 0),
      (3L, vec(0.995, 0.05, 0, 0), 0),
      (4L, vec(0, 1, 0, 0), 0),
      (5L, vec(1, 0, 0, 0), 1)
    ).toDF("id", "v", "c")
    val out = SemDedup.survivors(df, "id", "v", "c", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(1L) == ((1L, 1)))
    assert(out(2L) == ((1L, 0)))
    assert(out(3L) == ((1L, 0)))
    assert(out(4L) == ((4L, 1))) // orthogonal: own canonical
    assert(out(5L) == ((5L, 1))) // other cluster: untouched even though v==v1
  }

  test("cluster boundary is a wall: identical vectors in different clusters both survive") {
    val df = Seq(
      (10L, vec(1, 1, 0), 0),
      (11L, vec(1, 1, 0), 1)
    ).toDF("id", "v", "c")
    val out = SemDedup.survivors(df, "id", "v", "c", threshold = 0.99)
    assert(out.agg(sum("is_survivor")).head.getLong(0) == 2L)
  }

  test("IVF path: planted exact duplicates collapse (recall 1), distinct vectors survive") {
    // two well-separated groups so k=2 k-means splits them; plant an exact
    // duplicate inside each group — identical vectors always co-cluster
    val rows = Seq(
      (1L, vec(1, 0, 0, 0)), (2L, vec(1, 0, 0, 0)),      // dup pair, group A
      (3L, vec(0.9, 0.1, 0, 0)),                          // near A, below thr
      (4L, vec(0, 0, 1, 0)), (5L, vec(0, 0, 1, 0)),      // dup pair, group B
      (6L, vec(0, 0, 0.1, 0.9))                           // near B, below thr
    )
    val df = rows.toDF("id", "v")
    val out = SemDedup.survivorsIvf(spark, df, "id", "v", k = 2,
      threshold = 0.999, iterations = 3)
    val m = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    // each planted pair: exactly one survivor, canonical = min id
    assert(m(1L) == ((1L, 1)) && m(2L) == ((1L, 0)))
    assert(m(4L) == ((4L, 1)) && m(5L) == ((4L, 0)))
    // sub-threshold neighbours survive untouched
    assert(m(3L) == ((3L, 1)) && m(6L) == ((6L, 1)))
    out.unpersist()
    assert(out.count() == 6)
  }

  test("survivor laws: every canonical is a survivor and is ≤ its members") {
    val df = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val out = SemDedup.survivors(df, "vec_id", "embedding", "label", 0.3)
    val bad = out.as("o")
      .join(out.filter(col("is_survivor") === 1).select(col("vec_id").as("c")).as("s"),
        col("o.canonical") === col("s.c"), "left_anti")
    assert(bad.count() == 0, "some canonical id is not itself a survivor")
    assert(out.filter(col("canonical") > col("vec_id")).count() == 0)
  }
}
