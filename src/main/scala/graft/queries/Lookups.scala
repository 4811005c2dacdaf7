package graft.queries

import scala.collection.concurrent.TrieMap

/** Registered lookups (the coordinator's lookup registry analog, upstream
  * `registeredLookup` extraction / `LOOKUP()` in Druid SQL): named
  * string→string maps registered once and referenced by name from query
  * JSON. Process-local registry — at cluster scale the map travels to
  * executors as the literal the compiler builds, exactly like the inline
  * form (a lookup too big for a literal belongs in a broadcast-join
  * dimension table instead, the `lookup_map_dim` pattern).
  */
object Lookups {

  private val registry = TrieMap.empty[String, Map[String, String]]

  def register(name: String, mapping: Map[String, String]): Unit = {
    require(name.nonEmpty, "lookup name must be non-empty")
    require(mapping.nonEmpty, s"lookup '$name' must be non-empty")
    registry.put(name, mapping); ()
  }

  def unregister(name: String): Unit = { registry.remove(name); () }

  def get(name: String): Option[Map[String, String]] = registry.get(name)

  def names: Seq[String] = registry.keys.toSeq.sorted
}
