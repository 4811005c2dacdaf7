package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.pipeline.CacheScope

/** Lifecycle of [[CacheScope.withCached]] — the leak bounds and the
  * concurrent same-plan sharing rule (r8 verdict #6 + r8 advisor finding).
  * `Dataset.storageLevel` is the observable: it looks the plan up in the
  * session CacheManager (NONE once the entry is gone), so a freshly built
  * twin of the temp frame reads the SHARED entry's state.
  */
class CacheScopeSpec extends SparkSpec {

  /** poll until the temp plan's cache entry is gone (unpersist is
    * delivered via the async listener bus / daemon timer) */
  private def eventuallyUncached(mk: => org.apache.spark.sql.DataFrame,
      maxMs: Long = 15000): Boolean = {
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < maxMs) {
      if (mk.storageLevel == StorageLevel.NONE) return true
      Thread.sleep(100)
    }
    mk.storageLevel == StorageLevel.NONE
  }

  test("scope releases on the first materialization of the result") {
    def tmp = spark.range(0, 1000).select(col("id"), (col("id") * 3).as("v"))
    val out = CacheScope.withCached(tmp)(t =>
      t.groupBy((col("id") % 7).as("k")).agg(sum(col("v")).as("s")))
    assert(out.count() == 7)
    assert(eventuallyUncached(tmp), "cache entry must drop after the result ran")
  }

  test("abandoned scope releases by TTL with no executions at all") {
    def tmp = spark.range(0, 500).select(col("id"), (col("id") + 11).as("w"))
    System.setProperty("graft.cacheScope.ttlMs", "400")
    try {
      val out = CacheScope.withCached(tmp)(t => t.filter(col("w") > 100))
      assert(out != null) // built, never materialized, then abandoned
    } finally System.clearProperty("graft.cacheScope.ttlMs")
    // no action ever runs on the session for this plan — only the daemon
    // timer can release it
    assert(eventuallyUncached(tmp), "TTL must release an abandoned scope")
  }

  test("concurrent same-plan scopes: first materialization releases ONE scope, not the shared entry") {
    def tmp = spark.range(0, 800).select(col("id"), (col("id") * 5).as("u"))
    def build() = CacheScope.withCached(tmp)(t =>
      t.groupBy((col("id") % 3).as("k")).agg(sum(col("u")).as("s")))
    val out1 = build()
    val out2 = build() // overlapping scope over the SAME canonical temp plan
    assert(out1.count() == 3)
    // give the async listener event time to be delivered and claimed
    Thread.sleep(1500)
    assert(tmp.storageLevel != StorageLevel.NONE,
      "the r8 advisor bug: one event must not drain every scope's refcount")
    assert(out2.count() == 3)
    assert(eventuallyUncached(tmp),
      "second scope's own materialization releases the shared entry")
  }
}
