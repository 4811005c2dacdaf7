package graft.pipeline

import org.apache.spark.sql.Column

/** Exact-name column references. Druid join dataSources prefix right-side
  * columns with a DOT (`r.label`, Druid's convention), and bare
  * `functions.col` would parse the dot as struct access. Everything that
  * resolves Druid-side dimension / field names (the query compiler,
  * the filter DSL, aggregator specs) routes through here via a local
  * `col` shadow, so the quoting decision lives in ONE place.
  *
  * Embedded backticks are escaped by doubling (Spark's quoted-identifier
  * rule) — a user-controlled name like ``a`b`` resolves or misses cleanly
  * instead of mis-splitting the identifier.
  */
object Cols {
  def exact(name: String): Column = {
    val needsQuote = name.contains(".") || name.contains("`")
    org.apache.spark.sql.functions.col(
      if (needsQuote) "`" + name.replace("`", "``") + "`" else name)
  }
}
