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

  /** Parse once — callers that need both the referenced tables and the run
    * (the HTTP endpoint) should parse here and pass the plan to
    * [[runPlan]]/[[referencedTables]] instead of re-parsing per step. */
  def parse(sqlText: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    CatalystSqlParser.parsePlan(sqlText)

  /** Single-part table names the statement references (multi-part names are
    * catalog-qualified — never dataSources). */
  def referencedTables(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Set[String] =
    plan.collect {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        r.multipartIdentifier.head
    }.toSet

  def referencedTables(sqlText: String): Set[String] =
    referencedTables(parse(sqlText))

  /** Run `sqlText` with every reference to a key of `frames` substituted by
    * its DataFrame's logical plan. Name matching is CASE-INSENSITIVE, like
    * Spark's own identifier resolution (`SELECT * FROM CLICKS_DS` must hit
    * the "clicks_ds" dataSource exactly as the temp-view path did). A CTE
    * named like a frame shadows it everywhere (Druid's rule too):
    * CTE-defined names are excluded from substitution, case-insensitively,
    * so they resolve through normal CTE resolution. */
  def run(sqlText: String, frames: Map[String, DataFrame]): DataFrame =
    runPlan(parse(sqlText), frames)

  def runPlan(parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      frames: Map[String, DataFrame]): DataFrame = {
    require(frames.nonEmpty, "DruidSql.run needs at least one dataSource frame")
    val spark = frames.head._2.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val framesCi = frames.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    val cteNames = parsed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map { case (name, _, _) =>
          name.toLowerCase(java.util.Locale.ROOT) }
    }.flatten.toSet
    def substitute(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      plan.transformUp {
        // CTE definition bodies are NOT plan children — recurse explicitly
        case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
          w.copy(cteRelations = w.cteRelations.map { case (n, s, o) =>
            (n, substitute(s).asInstanceOf[SubqueryAlias], o)
          })
        case r: UnresolvedRelation if r.multipartIdentifier.length == 1 &&
            !cteNames(r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)) &&
            framesCi.contains(r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)) =>
          // alias under the name AS WRITTEN so qualified column references
          // (`CLICKS_DS.etype`) keep resolving
          SubqueryAlias(r.multipartIdentifier.head,
            framesCi(r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT))
              .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
              .queryExecution.logical)
      }
    GraftSqlBridge.ofRows(spark, dialectRewrite(substitute(parsed)))
  }

  /** Dialect-scoped function overrides (names colliding with Spark builtins
    * but carrying Druid semantics — see
    * [[graft.functions.DruidSqlFunctions.dialectOverrides]]): applied to the
    * STATEMENT's plan only, never the session registry, so plain Spark SQL
    * on the same session keeps builtin behavior. CTE definition bodies are
    * not plan children — recurse explicitly, like `substitute` above. */
  private def dialectRewrite(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val overrides = graft.functions.DruidSqlFunctions.dialectOverrides
    plan.transformUp {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, s, o) =>
          (n, dialectRewrite(s).asInstanceOf[SubqueryAlias], o)
        })
      case node => node.transformExpressions {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.nameParts.length == 1 && !f.isDistinct &&
              overrides.contains(
                f.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
          overrides(f.nameParts.head.toLowerCase(java.util.Locale.ROOT))(
            f.arguments)
      }
    }
  }
}
