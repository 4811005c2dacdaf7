package graft.queries

/** One JVM-wide scratch root for QueryDef bodies that materialize segment
  * stores (the replay headliner, stored-sketch oracles, bucketed-store
  * oracles, SQL ingestion). Each body previously called
  * `Files.createTempDirectory` per INVOCATION and never deleted it — a
  * bench loop or long-lived gate run accumulated unbounded /tmp data
  * (review finding r7). Here every invocation gets a fresh NUMBERED subdir
  * under ONE shared root (no synchronous delete in the benchmarked hot
  * path, so within-JVM growth is bounded by that run's invocation count,
  * not unbounded /tmp litter across runs), and a shutdown hook removes the
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

  /** Fresh empty dir under the shared root. Each invocation gets a UNIQUE
    * numbered subdir — no synchronous delete in the (benchmarked) hot
    * path; accumulation within one JVM run is bounded by that run's
    * invocation count and the shutdown hook removes the whole root. */
  def dir(name: String): String = {
    val d = root.resolve(s"${name}_${seq.incrementAndGet()}")
    java.nio.file.Files.createDirectories(d)
    d.toString
  }
}
