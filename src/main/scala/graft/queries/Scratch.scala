package graft.queries

/** One JVM-wide scratch root for QueryDef bodies that materialize segment
  * stores (the replay headliner, stored-sketch oracles, bucketed-store
  * oracles, SQL ingestion). Each body previously called
  * `Files.createTempDirectory` per INVOCATION and never deleted it — a
  * bench loop or long-lived gate run accumulated unbounded /tmp data
  * (review finding r7). Here every invocation gets a fresh NUMBERED subdir
  * under ONE shared root, and allocating a new dir for a NAME retires that
  * name's previous dir — so a long-lived server or gate loop holds a
  * BOUNDED number of store copies per query, not one per invocation
  * (advisor finding r8). Retired dirs are deleted on a daemon thread after
  * a GRACE PERIOD (default 120 s, `graft.scratch.graceMs`), because the
  * previous invocation's result is a LAZY DataFrame over its dir — a
  * consumer that forces it shortly after the next invocation begins (an
  * overlapping bench repeat, a slow reader) must not scan a vanishing
  * path (review r9; immediate deletion had that window). No delete ever
  * runs in the benchmarked hot path, and a shutdown hook removes the
  * whole root on JVM exit.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-scratch")
    sys.addShutdownHook(delete(r))
    r
  }

  private def delete(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => scala.util.Try(java.nio.file.Files.delete(f)))
    }

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lastByName =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()
  private def graceMs: Long =
    sys.props.get("graft.scratch.graceMs").map(_.toLong).getOrElse(120000L)
  // single daemon thread: deferred deletes serialize off the hot path; at
  // steady state (one retire per query invocation) the queue stays short,
  // so the bound is ~1 retiring copy per name plus the grace window
  private lazy val reaper =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-scratch-reaper"); t.setDaemon(true); t
    })

  /** Fresh empty dir under the shared root. Each invocation gets a UNIQUE
    * numbered subdir; the same name's PREVIOUS dir is scheduled for
    * deletion after the grace period (never synchronously, never in the
    * hot path) — long enough for any in-flight lazy consumer of the
    * previous invocation's store to finish. */
  def dir(name: String): String = {
    val d = root.resolve(s"${name}_${seq.incrementAndGet()}")
    java.nio.file.Files.createDirectories(d)
    val prev = lastByName.put(name, d)
    if (prev != null)
      reaper.schedule(new Runnable { def run(): Unit = delete(prev) },
        graceMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    d.toString
  }
}
