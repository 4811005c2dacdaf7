package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
import org.apache.spark.sql.graft.GraftSqlBridge

/** Druid SQL execution: parse the statement, substitute each single-part
  * table reference that names a provided dataSource with that dataSource's
  * plan DIRECTLY (a `SubqueryAlias` over the frame — no temp views, no
  * shared-session catalog mutation), register the Druid SQL function surface
  * ([[graft.functions.DruidSqlFunctions]]), and run. Shared by the
  * `/druid/v2/sql` endpoint ([[graft.sources.HttpIngestServer]]) and the
  * `druid_sql_*` oracle queries — the gate exercises the same code path the
  * daemon serves.
  */
object DruidSql {

  /** Single-part table names the statement references (multi-part names are
    * catalog-qualified — never dataSources). */
  def referencedTables(sqlText: String): Set[String] =
    CatalystSqlParser.parsePlan(sqlText).collect {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        r.multipartIdentifier.head
    }.toSet

  /** Run `sqlText` with every reference to a key of `frames` substituted by
    * its DataFrame's logical plan. A CTE named like a frame shadows it
    * everywhere (Druid's rule too): CTE-defined names are excluded from
    * substitution so they resolve through normal CTE resolution. */
  def run(sqlText: String, frames: Map[String, DataFrame]): DataFrame = {
    require(frames.nonEmpty, "DruidSql.run needs at least one dataSource frame")
    val spark = frames.head._2.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val parsed = CatalystSqlParser.parsePlan(sqlText)
    val cteNames = parsed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map { case (name, _, _) => name }
    }.flatten.toSet
    def substitute(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      plan.transformUp {
        // CTE definition bodies are NOT plan children — recurse explicitly
        case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
          w.copy(cteRelations = w.cteRelations.map { case (n, s, o) =>
            (n, substitute(s).asInstanceOf[SubqueryAlias], o)
          })
        case r: UnresolvedRelation
            if r.multipartIdentifier.length == 1 &&
              !cteNames(r.multipartIdentifier.head) &&
              frames.contains(r.multipartIdentifier.head) =>
          SubqueryAlias(r.multipartIdentifier.head,
            frames(r.multipartIdentifier.head)
              .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
              .queryExecution.logical)
      }
    GraftSqlBridge.ofRows(spark, substitute(parsed))
  }
}
