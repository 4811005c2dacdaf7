package graft.queries

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Registered lookups (the coordinator's lookup registry analog, upstream
  * `registeredLookup` extraction / `LOOKUP()` in Druid SQL): named
  * string→string maps registered at runtime and referenced by name from
  * query JSON / SQL. Re-registering a name bumps its VERSION — the Druid
  * lookup-update lifecycle — and queries compiled afterwards see the new
  * mapping (compiled plans keep the version they resolved, exactly like
  * Druid queries in flight).
  *
  * Scale shape, two regimes (`LOOKUP()` picks automatically, see
  * [[graft.functions.GraftFunctions]]):
  *  - small maps inline as a `CreateMap` literal — constant-folded,
  *    codegen'd, zero per-executor state;
  *  - large maps ship ONCE per executor as a [[Broadcast]] java HashMap
  *    probed O(1) by a codegen'd expression ([[graft.functions.LookupValue]])
  *    — a multi-MB literal would bloat the plan tree and every task binary,
  *    and `GetMapValue` over an array-backed literal probes O(n).
  * Broadcasts are cached per (name, version); stale versions unpersist on
  * update.
  */
object Lookups {

  final case class Entry(version: Long, mapping: Map[String, String])

  private val registry = TrieMap.empty[String, Entry]
  private val versions = new AtomicLong(0L)
  private val broadcasts =
    TrieMap.empty[(String, Long), Broadcast[java.util.HashMap[String, String]]]

  def register(name: String, mapping: Map[String, String]): Unit = {
    require(name.nonEmpty, "lookup name must be non-empty")
    require(mapping.nonEmpty, s"lookup '$name' must be non-empty")
    registry.put(name, Entry(versions.incrementAndGet(), mapping))
    dropBroadcasts(name)
  }

  def unregister(name: String): Unit = {
    registry.remove(name)
    dropBroadcasts(name)
  }

  private def dropBroadcasts(name: String): Unit =
    broadcasts.keys.filter(_._1 == name).foreach { k =>
      broadcasts.remove(k).foreach(_.unpersist(blocking = false))
    }

  def get(name: String): Option[Map[String, String]] =
    registry.get(name).map(_.mapping)

  def entry(name: String): Option[Entry] = registry.get(name)

  def names: Seq[String] = registry.keys.toSeq.sorted

  /** Broadcast of the lookup's CURRENT version, cached so repeated queries
    * reuse one executor-resident copy. */
  def broadcastFor(spark: SparkSession, name: String)
      : (Long, Broadcast[java.util.HashMap[String, String]]) = {
    val e = registry.getOrElse(name, throw new IllegalArgumentException(
      s"lookup '$name' is not registered (registered: ${names.mkString(",")})"))
    val bc = broadcasts.getOrElseUpdate((name, e.version), {
      val m = new java.util.HashMap[String, String](e.mapping.size * 2)
      e.mapping.foreach { case (k, v) => m.put(k, v) }
      spark.sparkContext.broadcast(m)
    })
    (e.version, bc)
  }
}
