package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared inventory lives in graft.queries.* (one QueryDef per operator
  * from SURVEY §2 + the [EXT] LLM-pipeline surface); this object is the flat
  * map the driver consumes.
  */
object SparkEntry {

  val registry: Seq[QueryDef] =
    RollupQueries.all ++ RelationalQueries.all ++ WindowingQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ MultimodalQueries.all ++
      DruidNativeQueries.all ++ DruidSqlQueries.all

  require(registry.map(_.name).distinct.size == registry.size,
    "duplicate query names in registry")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the star join (lineitem-based — no nanos-timestamp conf needed in
    * the driver's own session).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Bench headline subset. */
  def headlines: Seq[QueryDef] = registry.filter(_.headline)
}
