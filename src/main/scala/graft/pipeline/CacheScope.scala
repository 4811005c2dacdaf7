package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped `.persist()` for multi-consumer intermediates inside query
  * bodies (advice r7 / verdict r7 #2).
  *
  * Several pair-dedup and LM-scoring queries cache a subtree that feeds
  * 3–4 plan branches — measured as load-bearing (AQE does not reuse
  * exchanges across aggregation/join branches: 93 s vs 69 s at ×100 for
  * bigram; ×3 re-chunking for CDC). But a bare `.persist()` in a query
  * BODY is session-lifetime: the query returns a lazy DataFrame, nobody
  * is left holding the temp to unpersist it, and a long-lived server
  * running many corpora accumulates cached tables without bound (the
  * bench log's repeated "Asked to cache already cached data" was this).
  *
  * [[withCached]] makes the lifecycle mechanical: persist the temp, build
  * the result from it, and release the cache as soon as the FIRST action
  * that executes a plan containing the temp completes — which for the
  * engine's call patterns (Verify writes each query once; Bench forces
  * each freshly-constructed frame once) is exactly the result's
  * materialization. A second materialization of the SAME returned frame
  * recomputes the temp (correct, just uncached) — callers that genuinely
  * iterate a result should persist the RESULT, which they own.
  *
  * Sharing (review finding r8): Spark's CacheManager keys cache entries by
  * CANONICALIZED plan, so overlapping invocations of the same query (bench
  * repeats back-to-back, two concurrent server requests) resolve to ONE
  * shared entry — an early invocation's (async-delivered) release must not
  * yank the entry out from under a later one. Scopes therefore refcount
  * per canonical plan and only the LAST live scope unpersists.
  *
  * Leak bound (review finding r8): a scope whose result is never
  * materialized (frame built then discarded, or body throws downstream)
  * would otherwise pin its cache forever. Each listener self-releases
  * after [[MissLimit]] completed executions that did not contain its
  * subtree — bounded staleness instead of unbounded accumulation.
  */
object CacheScope {

  private val MissLimit = 512

  /** live-scope refcount per canonicalized temp plan */
  private val refs =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, Integer]()

  /** Decrement the plan's refcount; unpersist when this was the last
    * scope. blocking=false: block eviction is async bookkeeping, never
    * worth stalling the listener bus. */
  private def release(canon: LogicalPlan, cached: DataFrame): Unit = {
    val remaining = refs.compute(canon, (_, v) =>
      if (v == null || v <= 1) null else Integer.valueOf(v - 1))
    if (remaining == null)
      try cached.unpersist(blocking = false)
      catch { case _: Throwable => () }
  }

  /** Persist `tmp`, build `body(tmp)`, and unpersist `tmp` after the first
    * completed query execution on this session whose analyzed plan
    * contains `tmp`'s subtree (matched by canonicalized sameResult — the
    * same test Spark's own CacheManager uses for cache lookup). The
    * listener is one-shot and unregisters itself; unrelated actions on the
    * session never release the cache early. */
  def withCached(tmp: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    val spark = tmp.sparkSession
    val tmpPlan = tmp.queryExecution.analyzed
    val canon = tmpPlan.canonicalized
    refs.merge(canon, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
    val cached = tmp.persist()
    val out =
      try body(cached)
      catch { case e: Throwable => release(canon, cached); throw e }
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener { self =>
      private def done(): Unit =
        if (fired.compareAndSet(false, true)) {
          release(canon, cached)
          try spark.listenerManager.unregister(self)
          catch { case _: Throwable => () }
        }
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(_.sameResult(tmpPlan))
          catch { case _: Throwable => false }
        if (hit || misses.incrementAndGet() > MissLimit) done()
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    out
  }
}
