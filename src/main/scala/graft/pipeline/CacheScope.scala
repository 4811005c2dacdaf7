package graft.pipeline

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * the result from it, and release the scope as soon as the first action
  * that executes a plan containing the temp completes — which for the
  * engine's call patterns (Verify writes each query once; Bench forces
  * each freshly-constructed frame once) is exactly the result's
  * materialization. A second materialization of the SAME returned frame
  * recomputes the temp (correct, just uncached) — callers that genuinely
  * iterate a result should persist the RESULT, which they own.
  *
  * Sharing (review finding r8, advisor finding r8): Spark's CacheManager
  * keys cache entries by CANONICALIZED plan, so overlapping invocations of
  * the same query (bench repeats back-to-back, two concurrent server
  * requests) resolve to ONE shared entry. Scopes refcount per canonical
  * plan, and a materialization event releases exactly ONE scope of that
  * plan (the oldest live one) — not every matching scope, which would
  * drain the refcount on the first event and unpersist the shared entry
  * out from under the still-running later scope (the r8 advisor bug).
  * N overlapping scopes need N containing materializations (or their
  * individual limits below) to fully unpersist.
  *
  * Leak bounds — a scope whose result is never materialized (frame built
  * then discarded, or body throws downstream) must not pin its cache
  * forever (review finding r8; wall-clock cap r8 verdict #6):
  *  - [[MissLimit]]: self-release after 512 completed executions that did
  *    not contain the subtree.
  *  - TTL: self-release `graft.cacheScope.ttlMs` (default 10 min) after
  *    creation, on a daemon timer — so an ABANDONED scope on an idle
  *    server releases with zero executions ever happening.
  */
object CacheScope {

  private val MissLimit = 512

  /** wall-clock cap on an unreleased scope; system property so specs can
    * shrink it (read at scope creation). */
  private def ttlMs: Long =
    sys.props.get("graft.cacheScope.ttlMs").map(_.toLong).getOrElse(600000L)

  /** live-scope refcount per canonicalized temp plan — the cache ENTRY is
    * shared across scopes with the same canonical plan, so only the last
    * scope's release may unpersist. */
  private val refs =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, Integer]()

  /** one daemon timer thread serves every scope's TTL */
  private lazy val timer = {
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, "graft-cache-scope-ttl"); th.setDaemon(true); th
    })
    t
  }

  private final class Scope(val tmpPlan: LogicalPlan, val canon: LogicalPlan,
      cached: DataFrame) {
    val released = new AtomicBoolean(false)
    val misses = new AtomicInteger(0)
    val deadlineNs: Long = System.nanoTime() + ttlMs * 1000000L
    /** the scope's TTL timer task — cancelled on release so a scope
      * released by its materialization event (the common case, seconds)
      * does not stay strongly reachable from the timer queue for the
      * full TTL (review r9: hundreds of pinned plan trees in a bench
      * loop otherwise) */
    @volatile var ttlTask: java.util.concurrent.ScheduledFuture[_] = null

    /** Idempotent. Decrements the canon refcount; unpersists the shared
      * entry only when this was the last live scope. blocking=false:
      * block eviction is async bookkeeping, never worth stalling the
      * listener bus or the timer thread. */
    def release(): Unit =
      if (released.compareAndSet(false, true)) {
        val t = ttlTask
        if (t != null) t.cancel(false)
        val remaining = refs.compute(canon, (_, v) =>
          if (v == null || v <= 1) null else Integer.valueOf(v - 1))
        if (remaining == null)
          try cached.unpersist(blocking = false)
          catch { case _: Throwable => () }
      }
  }

  /** per-session live scopes + the session's single registered listener */
  private final class SessionState {
    val scopes = new java.util.concurrent.ConcurrentLinkedQueue[Scope]()
    val listener: QueryExecutionListener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = onEvent(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = onEvent(qe)
    }

    /** One event = at most one scope release PER CANONICAL PLAN (oldest
      * first); non-matching scopes age via miss count / deadline. The
      * listener bus delivers events on a single dispatch thread, but the
      * TTL timer may release concurrently — Scope.release is idempotent
      * and released scopes are lazily swept here. */
    private def onEvent(qe: QueryExecution): Unit = {
      val claimed = scala.collection.mutable.Set.empty[LogicalPlan]
      val it = scopes.iterator()
      val now = System.nanoTime()
      while (it.hasNext) {
        val sc = it.next()
        if (sc.released.get) it.remove()
        else {
          val hit =
            try qe.analyzed.exists(_.sameResult(sc.tmpPlan))
            catch { case _: Throwable => false }
          if (hit) {
            if (claimed.add(sc.canon)) { sc.release(); it.remove() }
            // else: another scope of the same plan already claimed this
            // event — neither a release nor a miss for this scope
          } else if (sc.misses.incrementAndGet() > MissLimit ||
              now > sc.deadlineNs) {
            sc.release(); it.remove()
          }
        }
      }
    }
  }

  // Keyed by session so one listener serves all scopes of that session.
  // Entries live as long as the JVM: bounded by the number of sessions
  // ever used with withCached (one, in every engine entry point).
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SessionState]()

  private def state(spark: SparkSession): SessionState =
    sessions.computeIfAbsent(spark, s => {
      val st = new SessionState
      s.listenerManager.register(st.listener)
      st
    })

  /** Persist `tmp`, build `body(tmp)`, and release the scope after the
    * first completed query execution on this session whose analyzed plan
    * contains `tmp`'s subtree (matched by canonicalized sameResult — the
    * same test Spark's own CacheManager uses for cache lookup), after
    * MissLimit unrelated executions, or after the TTL — whichever comes
    * first. Unrelated actions on the session never release the cache
    * early, and concurrent same-plan scopes each need their own
    * containing execution (one release per event per plan). */
  def withCached(tmp: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    val spark = tmp.sparkSession
    val tmpPlan = tmp.queryExecution.analyzed
    val canon = tmpPlan.canonicalized
    refs.merge(canon, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
    val cached = tmp.persist()
    val scope = new Scope(tmpPlan, canon, cached)
    val out =
      try body(cached)
      catch { case e: Throwable => scope.release(); throw e }
    val st = state(spark)
    st.scopes.add(scope)
    // TTL fires even if no execution ever happens on the session; it also
    // removes the scope from the queue (onEvent never runs on a session
    // with no executions, so without this the queue — and every DataFrame
    // each scope holds — would grow without bound, review r9)
    scope.ttlTask = timer.schedule(new Runnable {
      def run(): Unit = { scope.release(); st.scopes.remove(scope); () }
    }, ttlMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    // the materialization event may have already released the scope
    // before ttlTask was assigned — don't leave that task pinning it
    if (scope.released.get) {
      scope.ttlTask.cancel(false); st.scopes.remove(scope); ()
    }
    out
  }
}
