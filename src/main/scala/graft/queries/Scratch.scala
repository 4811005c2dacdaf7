package graft.queries

/** One JVM-wide scratch root for QueryDef bodies that materialize segment
  * stores (the replay headliner, stored-sketch oracles, bucketed-store
  * oracles, SQL ingestion). Each body previously called
  * `Files.createTempDirectory` per INVOCATION and never deleted it — a
  * bench loop or long-lived gate run accumulated unbounded /tmp data
  * (review finding r7). Here every invocation gets a fresh NUMBERED subdir
  * under ONE shared root, and allocating a new dir for a NAME
  * asynchronously deletes that name's previous dir — so a long-lived
  * server or gate loop holds at most ~2 store copies per query (the live
  * one plus the one draining), not one per invocation (advisor finding
  * r8). No synchronous delete ever runs in the benchmarked hot path, and a
  * shutdown hook removes the whole root on JVM exit.
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
  // single daemon thread: deletes are serialized off the hot path; at the
  // steady-state rate (one retire per query invocation) the queue is
  // effectively empty, so the bound stays ~1 retiring copy per name
  private lazy val reaper = {
    val e = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-scratch-reaper"); t.setDaemon(true); t
    })
    e
  }

  /** Fresh empty dir under the shared root. Each invocation gets a UNIQUE
    * numbered subdir; the same name's PREVIOUS dir is deleted
    * asynchronously (never synchronously in the hot path). The previous
    * dir is dead by contract at re-allocation time: every caller fully
    * consumes the store it built before its next invocation runs. */
  def dir(name: String): String = {
    val d = root.resolve(s"${name}_${seq.incrementAndGet()}")
    java.nio.file.Files.createDirectories(d)
    val prev = lastByName.put(name, d)
    if (prev != null) reaper.execute(() => delete(prev))
    d.toString
  }
}
