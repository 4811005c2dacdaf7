package graft.queries

import scala.jdk.CollectionConverters._

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
    CatalystSqlParser.parsePlan(rewriteUnnest(sqlText))

  private def isIdent(c: Char) = c.isLetterOrDigit || c == '_'

  /** Druid SQL `CROSS JOIN UNNEST(expr) [AS] alias(col)` (and the comma
    * form `, UNNEST(expr) AS alias(col)`) → Spark
    * `LATERAL VIEW EXPLODE(expr) alias AS col`, applied to the statement
    * TEXT before parsing: Spark's parser only accepts UNNEST as an
    * UNCORRELATED table function, so the Druid idiom — whose argument
    * references the left relation's columns — cannot be recovered
    * post-parse. Quote-aware: occurrences inside '…'/"…" strings or `…`
    * quoted identifiers are untouched. Spark's grammar hangs LATERAL VIEW
    * after ALL join items, so an UNNEST followed by another JOIN fails
    * loudly at parse — never a silent mis-rewrite. `AS alias(col)` is
    * required (it names the emitted column), like Druid SQL itself.
    */
  private[queries] def rewriteUnnest(sql: String): String = {
    // the quote-aware word scan and paren matcher are the OBJECT-level
    // findWord/matchParen — one scanner definition, so a quote/escape rule
    // fix cannot make the UNNEST rewrite and the EXTERN/APPEND rewrites
    // disagree on where strings end (review finding r7)
    var s = sql
    var from = 0
    while (true) {
      val u = findWord(s, "unnest", from)
      if (u < 0) return s
      // backward: skip ws, then either `cross join` or a bare comma
      var b = u - 1
      while (b >= 0 && s(b).isWhitespace) b -= 1
      def wordEndsAt(word: String, end: Int): Boolean =
        end - word.length + 1 >= 0 &&
          s.regionMatches(true, end - word.length + 1, word, 0, word.length) &&
          (end - word.length < 0 || !isIdent(s(end - word.length)))
      val start =
        if (b >= 0 && s(b) == ',') b
        else if (wordEndsAt("join", b)) {
          var b2 = b - 4
          while (b2 >= 0 && s(b2).isWhitespace) b2 -= 1
          if (wordEndsAt("cross", b2)) b2 - 4 else -1
        } else -1
      if (start < 0) { from = u + 1 } // not the FROM idiom — parser decides
      else {
        var j = u + 6
        def ws(): Unit = while (j < s.length && s(j).isWhitespace) j += 1
        ws()
        require(j < s.length && s(j) == '(',
          "UNNEST must be followed by a parenthesized expression")
        val close = matchParen(s, j)
        val e = s.substring(j + 1, close)
        j = close + 1; ws()
        if (s.regionMatches(true, j, "as", 0, 2) &&
            (j + 2 >= s.length || !isIdent(s(j + 2)))) { j += 2; ws() }
        val aliasStart = j
        while (j < s.length && isIdent(s(j))) j += 1
        val alias = s.substring(aliasStart, j)
        ws()
        require(alias.nonEmpty && j < s.length && s(j) == '(',
          "UNNEST needs `AS alias(col)` to name the emitted column")
        j += 1; ws()
        val colStart = j
        while (j < s.length && isIdent(s(j))) j += 1
        val colName = s.substring(colStart, j)
        ws()
        require(colName.nonEmpty && j < s.length && s(j) == ')',
          "UNNEST alias must name exactly one column: `AS alias(col)`")
        j += 1
        s = s.substring(0, start) +
          s" LATERAL VIEW EXPLODE($e) $alias AS $colName" + s.substring(j)
        from = start + 1
      }
    }
    s // unreachable
  }

  /** Collect over `plan`, every subquery-expression plan, AND every CTE
    * definition body — plain TreeNode.collect visits children only, and
    * neither SubqueryExpression plans nor UnresolvedWith.cteRelations are
    * children, so a dataSource referenced only inside a scalar/IN/EXISTS
    * subquery or a WITH body would otherwise be invisible to routing. */
  private def collectWithSubqueries[A](
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)(
      pf: PartialFunction[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, A])
      : Seq[A] = {
    val own = plan.collect(pf)
    val nested = plan.collect {
      case node =>
        val subs = node.expressions.flatMap(_.collect {
          case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
            collectWithSubqueries(s.plan)(pf)
        }).flatten
        val ctes = node match {
          case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
            w.cteRelations.flatMap { case (_, s, _) =>
              collectWithSubqueries(s)(pf) }
          case _ => Seq.empty
        }
        subs ++ ctes
    }.flatten
    own ++ nested
  }

  def referencedTables(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Set[String] =
    collectWithSubqueries(plan) {
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
    * so they resolve through normal CTE resolution. `metaFrames` maps
    * TWO-part lowercase names (INFORMATION_SCHEMA.TABLES / .COLUMNS,
    * sys.segments — the Druid SQL metadata tables) to their frames. */
  def run(sqlText: String, frames: Map[String, DataFrame]): DataFrame =
    runPlan(parse(sqlText), frames)

  /** Druid's `useApproximateCountDistinct` context flag (EXPLICIT true):
    * COUNT(DISTINCT …) rewrites to the approximate HLL++ aggregate —
    * upstream's default behavior; this engine defaults to EXACT (strictly
    * more accurate, a documented delta) and only approximates on request.
    * Multi-argument COUNT(DISTINCT a, b) approximates the tuple. */
  private def approxCountDistinctRewrite(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformUp {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, s, o) =>
          (n, approxCountDistinctRewrite(s).asInstanceOf[SubqueryAlias], o)
        })
      case node => node.transformExpressionsUp {
        // subquery expressions hold PLANS that transformUp never visits —
        // a COUNT(DISTINCT) inside a scalar/IN/EXISTS subquery must not
        // silently stay exact while the outer query approximates
        case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          sub.withNewPlan(approxCountDistinctRewrite(sub.plan))
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.nameParts.length == 1 &&
              f.nameParts.head.equalsIgnoreCase("count") && f.isDistinct =>
          import org.apache.spark.sql.catalyst.expressions._
          val arg =
            if (f.arguments.length == 1) f.arguments.head
            // exact COUNT(DISTINCT a, b) skips rows where ANY argument is
            // null (SQL standard); struct(a, b) is never null, so guard:
            // null out the whole tuple when any member is null, and
            // approx_count_distinct ignores null inputs like the exact agg
            else If(f.arguments.map(IsNull(_): Expression).reduce(Or(_, _)),
              Literal.create(null, org.apache.spark.sql.types.NullType),
              CreateStruct(f.arguments))
          f.copy(nameParts = Seq("approx_count_distinct"),
            arguments = Seq(arg), isDistinct = false)
      }
    }

  def runPlan(parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      frames: Map[String, DataFrame],
      metaFrames: Map[Seq[String], DataFrame] = Map.empty,
      approxCountDistinct: Boolean = false): DataFrame = {
    // no frames is legitimate for a TABLE-LESS statement (SELECT 1 — the
    // JDBC health-check pattern); a table-referencing statement with no
    // matching frame still fails loud at name resolution below
    val spark = frames.headOption.map(_._2.sparkSession)
      .orElse(metaFrames.headOption.map(_._2.sparkSession))
      .getOrElse(org.apache.spark.sql.SparkSession.active)
    graft.functions.GraftFunctions.register(spark)
    val framesCi = frames.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    // CTE names shadow frames (Druid's rule). A plan's OWN WITH names plus
    // everything inherited from enclosing scopes: a CTE defined inside a
    // subquery expression must shadow within that subquery, so each
    // substitute level re-collects names reachable at its root and unions
    // the enclosing scope's.
    // SCOPED top-down substitution: each UnresolvedWith extends the shadow
    // set for ITS OWN subtree only — a CTE defined inside a derived table
    // or a subquery expression must not shadow a same-named dataSource in
    // the enclosing query (SQL scoping, Druid's rule; the old
    // collect-all-names approach failed exactly those statements).
    // Subquery-expression PLANS are not plan children, so each node's own
    // expressions recurse explicitly with the current scope.
    def substitute(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        scope: Set[String])
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = plan match {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        // visibility follows Spark's own (non-recursive) CTE resolution:
        // a body sees the enclosing scope plus STRICTLY EARLIER siblings —
        // a self- or forward-reference is NOT the CTE, so a same-named
        // dataSource still substitutes there (Druid's behavior:
        // `WITH x AS (SELECT … FROM x)` reads the dataSource x)
        val lower = w.cteRelations.map { case (n, _, _) =>
          n.toLowerCase(java.util.Locale.ROOT) }
        w.copy(
          child = substitute(w.child, scope ++ lower),
          cteRelations = w.cteRelations.zipWithIndex.map {
            case ((n, s, o), i) =>
              (n, substitute(s, scope ++ lower.take(i))
                .asInstanceOf[SubqueryAlias], o)
          })
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 &&
          !scope(r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)) &&
          framesCi.contains(r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)) =>
        // alias under the name AS WRITTEN so qualified column references
        // (`CLICKS_DS.etype`) keep resolving
        SubqueryAlias(r.multipartIdentifier.head,
          framesCi(r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT))
            .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.logical)
      // metadata tables: two-part names (INFORMATION_SCHEMA.TABLES,
      // sys.segments) — alias under the LAST part so `FROM
      // INFORMATION_SCHEMA.COLUMNS` columns resolve unqualified
      case r: UnresolvedRelation if r.multipartIdentifier.length == 2 &&
          metaFrames.contains(
            r.multipartIdentifier.map(_.toLowerCase(java.util.Locale.ROOT))) =>
        SubqueryAlias(r.multipartIdentifier.last,
          metaFrames(r.multipartIdentifier.map(
              _.toLowerCase(java.util.Locale.ROOT)))
            .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.logical)
      case node =>
        node.mapChildren(substitute(_, scope)).mapExpressions(_.transform {
          case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
            sub.withNewPlan(substitute(sub.plan, scope))
        })
    }
    GraftSqlBridge.ofRows(spark, dialectRewrite(substitute(
      if (approxCountDistinct) approxCountDistinctRewrite(parsed) else parsed,
      Set.empty)))
  }

  // ---------------------------------------------------- parameterized SQL

  /** Druid's parameterized-SQL binding (`{"query": "… WHERE x = ?",
    * "parameters": [{"type": "VARCHAR", "value": "foo"}]}`): each unquoted
    * `?` placeholder is replaced, in order, by a TYPED LITERAL rendered
    * from the matching parameter — the server-side substitution Druid
    * performs before planning. String values escape their quotes ('' form)
    * so a value can never break out of its literal; numeric values must
    * parse as numbers (never spliced raw); count mismatches either way are
    * loud. `?` inside string literals or quoted identifiers is data, not a
    * placeholder. */
  /** Druid 31 `SET` statements: leading `SET key = literal;` statements
    * ahead of the query become query-context entries. Values must be
    * LITERALS (quoted string with '' escaping, number, TRUE/FALSE) — the
    * Druid grammar; anything else stays in the text and fails as SQL.
    * Returns (remaining statement, context entries in order). */
  private val SetStmtRe =
    """(?is)^\s*SET\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*('(?:[^']|'')*'|TRUE|FALSE|-?\d+(?:\.\d+)?)\s*;""".r
  def extractSets(sql: String)
      : (String, Seq[(String, com.fasterxml.jackson.databind.JsonNode)]) = {
    val nodes = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, com.fasterxml.jackson.databind.JsonNode)]
    var rest = sql
    var m = SetStmtRe.findPrefixMatchOf(rest)
    while (m.isDefined) {
      val key = m.get.group(1)
      val lit = m.get.group(2)
      val node: com.fasterxml.jackson.databind.JsonNode =
        if (lit.startsWith("'"))
          nodes.textNode(lit.substring(1, lit.length - 1).replace("''", "'"))
        else if (lit.equalsIgnoreCase("true")) nodes.booleanNode(true)
        else if (lit.equalsIgnoreCase("false")) nodes.booleanNode(false)
        else if (lit.contains('.')) nodes.numberNode(lit.toDouble)
        else nodes.numberNode(lit.toLong)
      out += key -> node
      rest = rest.substring(m.get.end)
      m = SetStmtRe.findPrefixMatchOf(rest)
    }
    (rest, out.toSeq)
  }

  def bindParameters(sql: String,
      params: Seq[com.fasterxml.jackson.databind.JsonNode]): String = {
    def render(p: com.fasterxml.jackson.databind.JsonNode): String = {
      val t = Option(p.get("type")).map(_.asText.toUpperCase(java.util.Locale.ROOT))
        .getOrElse(throw new IllegalArgumentException("parameter needs a type"))
      val v = Option(p.get("value")).getOrElse(
        throw new IllegalArgumentException("parameter needs a value"))
      // backslashes escape too: Catalyst's default lexer treats \' as an
      // escaped quote, so a value ENDING in a backslash would otherwise
      // swallow the closing quote and let the next parameter break out of
      // the literal (SQL injection; review finding r7)
      def q(s: String): String =
        "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
      if (v.isNull) "NULL"
      else t match {
        case "VARCHAR" | "CHAR" => q(v.asText)
        case "BIGINT" | "INTEGER" | "SMALLINT" | "TINYINT" =>
          val s = v.asText
          require(scala.util.Try(s.toLong).isSuccess,
            s"parameter value '$s' is not a valid $t")
          s
        case "DOUBLE" | "FLOAT" | "REAL" | "DECIMAL" =>
          val s = v.asText
          require(scala.util.Try(s.toDouble).isSuccess,
            s"parameter value '$s' is not a valid $t")
          s
        case "BOOLEAN" =>
          if (v.asBoolean(v.asText.equalsIgnoreCase("true"))) "TRUE" else "FALSE"
        case "TIMESTAMP" => "TIMESTAMP " + q(v.asText)
        case "DATE"      => "DATE " + q(v.asText)
        case other => throw new IllegalArgumentException(
          s"unsupported parameter type '$other' (VARCHAR/CHAR, BIGINT/" +
            "INTEGER/SMALLINT/TINYINT, DOUBLE/FLOAT/REAL/DECIMAL, BOOLEAN, " +
            "TIMESTAMP, DATE)")
      }
    }
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0
    var next = 0
    while (i < sql.length) {
      val c = sql(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`') {
          out += c; i += 1; if (i < sql.length) out += sql(i)
        } else { if (c == quote) quote = 0; out += c }
      } else if (c == '-' && i + 1 < sql.length && sql(i + 1) == '-') {
        // `--` line comment: a '?' inside is commentary, not a placeholder
        val end = sql.indexOf('\n', i)
        val stop = if (end < 0) sql.length else end
        out ++= sql.substring(i, stop); i = stop - 1
      } else if (c == '/' && i + 1 < sql.length && sql(i + 1) == '*') {
        // `/* */` block comment (no nesting — the SQL standard's form)
        val end = sql.indexOf("*/", i + 2)
        val stop = if (end < 0) sql.length else end + 2
        out ++= sql.substring(i, stop); i = stop - 1
      } else if (c == '\'' || c == '"' || c == '`') { quote = c; out += c }
      else if (c == '?') {
        require(next < params.length,
          s"query has more '?' placeholders than parameters (${params.length})")
        out ++= render(params(next)); next += 1
      } else out += c
      i += 1
    }
    require(next == params.length,
      s"query has $next '?' placeholders but ${params.length} parameters")
    out.toString
  }

  // -------------------------------------------------------- TABLE(EXTERN)

  /** Druid MSQ's external-input table function:
    * `TABLE(EXTERN('<inputSource>', '<inputFormat>', '<signature>'))` in a
    * FROM clause reads raw files through the engine's parseSpec machinery.
    * Extracted by TEXT rewrite (quote-aware, like [[rewriteUnnest]] — the
    * arguments are string literals a post-parse rewrite could recover, but
    * the ingest path regex-splits the statement before parsing, so the
    * text seam is the one both paths share): each occurrence is replaced
    * by a reserved relation name `__extern_N`, returned with its three
    * argument strings; the caller builds the frames via [[externFrame]]
    * and passes them like any dataSource. */
  /** First occurrence of `word` (whole-identifier, case-insensitive) at or
    * after `from` that is OUTSIDE any string literal / quoted identifier —
    * the shared scanner behind the TABLE(EXTERN)/TABLE(APPEND) rewrites. */
  private def findWord(s: String, word: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`') i += 1
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"' || c == '`') quote = c
      else if (s.regionMatches(true, i, word, 0, word.length) &&
          (i == 0 || !isIdent(s(i - 1))) &&
          (i + word.length >= s.length || !isIdent(s(i + word.length))))
        return i
      i += 1
    }
    -1
  }

  /** Index of the ')' matching the '(' at `open`, quote-aware. */
  private def matchParen(s: String, open: Int): Int = {
    var i = open; var depth = 0; var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`') i += 1
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"' || c == '`') quote = c
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parentheses")
  }

  def extractExterns(sql: String)
      : (String, Seq[(String, (String, String, String))]) = {
    // three SQL string literals ('' self-escape) separated by commas
    def parseArgs(s: String): Seq[String] = {
      var i = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (i < s.length) {
        while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
        if (i < s.length) {
          require(s(i) == '\'',
            s"EXTERN arguments must be string literals, got: ${s.substring(i).take(20)}")
          i += 1
          val sb = new StringBuilder
          var done = false
          while (!done) {
            require(i < s.length, "EXTERN: unterminated string literal")
            if (s(i) == '\'' && i + 1 < s.length && s(i + 1) == '\'') {
              sb += '\''; i += 2
            } else if (s(i) == '\'') { i += 1; done = true }
            else { sb += s(i); i += 1 }
          }
          out += sb.toString
        }
      }
      out.toSeq
    }
    var s = sql
    var from = 0
    var n = 0
    val externs = scala.collection.mutable.ArrayBuffer
      .empty[(String, (String, String, String))]
    while (true) {
      val e = findWord(s, "extern", from)
      if (e < 0) return (s, externs.toSeq)
      // backward: `TABLE (` must precede
      var b = e - 1
      while (b >= 0 && s(b).isWhitespace) b -= 1
      if (b < 0 || s(b) != '(') { from = e + 1 }
      else {
        var t = b - 1
        while (t >= 0 && s(t).isWhitespace) t -= 1
        val tStart = t - 4
        if (tStart < 0 || !s.regionMatches(true, tStart, "table", 0, 5) ||
            (tStart > 0 && isIdent(s(tStart - 1)))) { from = e + 1 }
        else {
          var j = e + 6
          while (j < s.length && s(j).isWhitespace) j += 1
          require(j < s.length && s(j) == '(',
            "EXTERN must be followed by a parenthesized argument list")
          val closeE = matchParen(s, j)
          val closeT = matchParen(s, b)
          require(closeT > closeE, "TABLE(EXTERN(...)): unbalanced parentheses")
          // anything between EXTERN's close and TABLE's close would be
          // silently spliced away — loud instead (review finding r7)
          require(s.substring(closeE + 1, closeT).forall(_.isWhitespace),
            "TABLE(...) must contain exactly one EXTERN(...) call")
          val args = parseArgs(s.substring(j + 1, closeE))
          require(args.length == 3,
            s"EXTERN takes (inputSource, inputFormat, signature) — got ${args.length} args")
          val name = s"__extern_$n"
          n += 1
          externs += name -> ((args(0), args(1), args(2)))
          s = s.substring(0, tStart) + name + s.substring(closeT + 1)
          from = tStart + name.length
        }
      }
    }
    (s, externs.toSeq) // unreachable
  }

  /** Build the DataFrame for one EXTERN reference. `local` inputSource only
    * (zero-egress environment — http/s3/gcs are a loud error naming the
    * gap); `files` or `baseDir` listing; inputFormat json/csv/tsv/regex via
    * [[graft.sources.Sources.parseRecords]] (malformed record → all-null
    * row, the parseSpec contract); signature types string/long/double/float.
    */
  def externFrame(spark: org.apache.spark.sql.SparkSession,
      inputSource: String, inputFormat: String, signature: String): DataFrame = {
    import org.apache.spark.sql.types._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val src = mapper.readTree(inputSource)
    val srcType = Option(src.get("type")).map(_.asText).getOrElse("")
    require(srcType == "local",
      s"EXTERN inputSource type '$srcType' is not supported here — only " +
        "'local' (this engine runs without egress; stage remote data first)")
    val files: Seq[String] =
      if (src.has("files"))
        src.get("files").elements().asScala.map(_.asText).toSeq
      else if (src.has("baseDir")) Seq(src.get("baseDir").asText)
      else throw new IllegalArgumentException(
        "local inputSource needs 'files' or 'baseDir'")
    require(files.nonEmpty, "EXTERN inputSource lists no files")
    val fmt = mapper.readTree(inputFormat)
    val fmtType = Option(fmt.get("type")).map(_.asText).getOrElse("json")
    val sig = mapper.readTree(signature)
    val fields = sig.elements().asScala.map { f =>
      val name = Option(f.get("name")).map(_.asText).getOrElse(
        throw new IllegalArgumentException("EXTERN signature entry needs a name"))
      val t = Option(f.get("type")).map(_.asText).getOrElse("string")
      val dt = t.toLowerCase(java.util.Locale.ROOT) match {
        case "string" => StringType
        case "long"   => LongType
        case "double" => DoubleType
        case "float"  => FloatType
        case other => throw new IllegalArgumentException(
          s"EXTERN signature type '$other' (string/long/double/float)")
      }
      StructField(name, dt)
    }.toSeq
    require(fields.nonEmpty, "EXTERN signature lists no columns")
    fmtType match {
      // columnar formats (Druid MSQ reads these too): native Spark readers
      // — predicate pushdown and column pruning reach the scan, no line
      // parse; the declared signature projects and casts the columns it
      // names (a missing column is an analysis error, like Druid)
      case "parquet" | "orc" =>
        import org.apache.spark.sql.functions.col
        spark.read.format(fmtType).load(files: _*)
          .select(fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      case lineFmt =>
        val parser = lineFmt match {
          case "json" => graft.config.ParserSpec("json")
          case "csv"  => graft.config.ParserSpec("csv")
          case "tsv"  => graft.config.ParserSpec("delimited", delimiter = "\t")
          case "regex" => graft.config.ParserSpec("regex",
            pattern = Option(fmt.get("pattern")).map(_.asText))
          case other => throw new IllegalArgumentException(
            s"EXTERN inputFormat '$other' is not supported " +
              "(json/csv/tsv/regex/parquet/orc)")
        }
        // columns declared for the delimited formats come from the signature
        val parserWithCols =
          if (parser.format == "json" || parser.format == "regex") parser
          else parser.copy(columns = fields.map(_.name))
        val raw = spark.read.textFile(files: _*).toDF("value")
        graft.sources.Sources.parseRecords(raw, StructType(fields), parserWithCols)
    }
  }

  /** Druid 28's `TABLE(APPEND('ds1','ds2',…))`: union-BY-NAME over several
    * dataSources, missing columns null-filled — the SQL twin of the native
    * `union` dataSource. Each occurrence rewrites to a `__append_N`
    * relation; callers build its frame from the member names via
    * [[appendFrame]]. Quote-aware like the EXTERN scanner — the pattern
    * spelled inside a string literal or quoted identifier is data and
    * must not be rewritten (a regex-only pass corrupted such literals). */
  def extractAppends(sql: String): (String, Seq[(String, Seq[String])]) = {
    val specs = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    var s = sql
    var from = 0
    var n = 0
    while (true) {
      val a = findWord(s, "append", from)
      if (a < 0) return (s, specs.toSeq)
      // backward: `TABLE (` must precede, exactly like the EXTERN scanner
      var b = a - 1
      while (b >= 0 && s(b).isWhitespace) b -= 1
      if (b < 0 || s(b) != '(') { from = a + 1 }
      else {
        var t = b - 1
        while (t >= 0 && s(t).isWhitespace) t -= 1
        val tStart = t - 4
        if (tStart < 0 || !s.regionMatches(true, tStart, "table", 0, 5) ||
            (tStart > 0 && isIdent(s(tStart - 1)))) { from = a + 1 }
        else {
          var j = a + "append".length
          while (j < s.length && s(j).isWhitespace) j += 1
          require(j < s.length && s(j) == '(',
            "APPEND must be followed by a parenthesized name list")
          val closeA = matchParen(s, j)
          val closeT = matchParen(s, b)
          require(closeT > closeA, "TABLE(APPEND(...)): unbalanced parentheses")
          // ditto: tokens between APPEND's close and TABLE's close must not
          // be silently discarded (review finding r7)
          require(s.substring(closeA + 1, closeT).forall(_.isWhitespace),
            "TABLE(...) must contain exactly one APPEND(...) call")
          // names come out of their quotes individually — a comma INSIDE a
          // quoted name must not split it ('' self-escape honored)
          val body = s.substring(j + 1, closeA)
          val names = "'((?:[^']|'')*)'".r.findAllMatchIn(body)
            .map(_.group(1).replace("''", "'")).toSeq
          // the body must be NOTHING BUT quoted names, commas, and
          // whitespace — an unquoted member or a missing comma would
          // otherwise be silently dropped and the query would run over a
          // partial member list (wrong rows, no error)
          val residue = "'(?:[^']|'')*'".r.replaceAllIn(body, "")
          require(residue.forall(c => c == ',' || c.isWhitespace),
            s"APPEND arguments must be a comma-separated list of quoted " +
              s"dataSource names; unexpected token(s): '${residue.trim}'")
          require(names.nonEmpty && names.forall(_.nonEmpty),
            "APPEND needs at least one dataSource name")
          require(residue.count(_ == ',') == names.size - 1,
            "APPEND arguments must be separated by single commas")
          val alias = s"__append_$n"; n += 1
          specs += alias -> names
          s = s.substring(0, tStart) + alias + s.substring(closeT + 1)
          from = tStart + alias.length
        }
      }
    }
    (s, specs.toSeq) // unreachable
  }

  /** Frame for one APPEND: members resolved case-insensitively from
    * `frames`, combined with unionByName(allowMissingColumns) — exactly
    * the native union dataSource's null-filling semantics. */
  def appendFrame(names: Seq[String],
      frames: Map[String, DataFrame]): DataFrame = {
    val ci = frames.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    names.map(n => ci.getOrElse(n.toLowerCase(java.util.Locale.ROOT),
        throw new IllegalArgumentException(
          s"APPEND references unknown dataSource '$n' " +
            s"(known: ${frames.keys.toSeq.sorted.mkString(",")})")))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[run]]'s EXTERN/APPEND-aware entry: rewrite `TABLE(EXTERN(...))` and
    * `TABLE(APPEND(...))` references, build their frames, run.
    * Programmatic twin of the endpoint path. */
  def runWithExterns(sqlText: String, frames: Map[String, DataFrame],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val (rew1, externs) = extractExterns(sqlText)
    val (rew, appends) = extractAppends(rew1)
    val ext = externs.map { case (n, (a, b, c)) =>
      n -> externFrame(spark, a, b, c) }.toMap
    val app = appends.map { case (alias, names) =>
      alias -> appendFrame(names, frames) }.toMap
    runPlan(parse(rew), frames ++ ext ++ app)
  }

  // ----------------------------------------------------- EXPLAIN PLAN FOR

  private val ExplainRe = """(?is)^\s*EXPLAIN\s+PLAN\s+FOR\s+(.+)\s*$""".r

  /** `EXPLAIN PLAN FOR <query>` (Druid SQL's plan introspection statement):
    * the inner query text, when the statement is an explain. */
  def explainInner(sqlText: String): Option[String] =
    ExplainRe.findFirstMatchIn(sqlText).map(_.group(1))

  // ------------------------------------------------------- metadata tables

  /** Two-part (schema-qualified) table references in a parsed plan —
    * candidates for the metadata-table surface. */
  def referencedMeta(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Set[Seq[String]] =
    collectWithSubqueries(plan) {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 2 =>
        r.multipartIdentifier.map(_.toLowerCase(java.util.Locale.ROOT))
    }.toSet

  /** Spark type → Druid SQL's INFORMATION_SCHEMA type names. */
  private def sqlTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType                 => "VARCHAR"
      case LongType                   => "BIGINT"
      case IntegerType | ShortType | ByteType => "INTEGER"
      case DoubleType                 => "DOUBLE"
      case FloatType                  => "FLOAT"
      case BooleanType                => "BOOLEAN"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case DateType                   => "DATE"
      case BinaryType                 => "COMPLEX"
      case _: ArrayType               => "ARRAY"
      case other                      => other.sql
    }
  }

  /** Build a Druid SQL metadata table (`INFORMATION_SCHEMA.TABLES`,
    * `INFORMATION_SCHEMA.COLUMNS`, `sys.segments`) from the server's
    * routing state. `tables` maps queryable dataSource name → fresh frame
    * (thunks — only COLUMNS materializes them, for schemas);
    * `segmentStores` maps dataSource → segment-store directory (routed
    * streaming stores + SQL-ingested stores) for `sys.segments`, whose
    * `num_rows` recomputes from the store like Druid's published-segment
    * accounting. Unknown two-part names return None — the caller leaves
    * them to normal (failing) resolution, a loud error. */
  def metaFrame(spark: org.apache.spark.sql.SparkSession, parts: Seq[String],
      tables: Map[String, () => DataFrame],
      segmentStores: => Map[String, String],
      /** (task_id, type, datasource, status) */
      tasks: => Seq[(String, String, String, String)] = Nil,
      supervisors: => Seq[(String, String, Boolean)] = Nil): Option[DataFrame] = {
    import spark.implicits._
    parts match {
      case Seq("information_schema", "schemata") =>
        Some(Seq("druid", "information_schema", "sys").sorted
          .map(sc => ("druid", sc))
          .toDF("CATALOG_NAME", "SCHEMA_NAME"))
      case Seq("information_schema", "tables") =>
        Some(tables.keys.toSeq.sorted
          .map(ds => ("druid", "druid", ds, "TABLE"))
          .toDF("TABLE_CATALOG", "TABLE_SCHEMA", "TABLE_NAME", "TABLE_TYPE"))
      case Seq("information_schema", "columns") =>
        Some(tables.toSeq.sortBy(_._1).flatMap { case (ds, thunk) =>
          thunk().schema.fields.zipWithIndex.map { case (f, i) =>
            ("druid", "druid", ds, f.name, i + 1, sqlTypeName(f.dataType),
              if (f.nullable) "YES" else "NO")
          }
        }.toDF("TABLE_CATALOG", "TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME",
          "ORDINAL_POSITION", "DATA_TYPE", "IS_NULLABLE"))
      case Seq("sys", "segments") =>
        import org.apache.spark.sql.functions._
        val perStore = segmentStores.toSeq.sortBy(_._1).flatMap {
          case (ds, root) =>
            scala.util.Try {
              graft.sink.SegmentStore.metadata(spark, root)
                .select(col(graft.pipeline.Pipeline.SegmentCol).cast("string")
                    .as("start"),
                  col("rows").cast("long").as("num_rows"))
                .withColumn("datasource", lit(ds))
            }.toOption // empty/unreadable store ⇒ no published segments
        }
        val all = perStore.reduceOption(_.unionByName(_)).getOrElse(
          Seq.empty[(String, Long, String)]
            .toDF("start", "num_rows", "datasource"))
        Some(all.select(
          concat_ws("_", col("datasource"), col("start")).as("segment_id"),
          col("datasource"), col("start"), col("num_rows"),
          lit(1).as("is_published")))
      // this engine IS the one "server" — a single broker-shaped row
      // (Druid's sys.servers columns, sizes not applicable → 0)
      case Seq("sys", "servers") =>
        Some(Seq(("local", "localhost", 0, "broker", "_default_tier", 0L, 0L))
          .toDF("server", "host", "plaintext_port", "server_type", "tier",
            "curr_size", "max_size"))
      // streaming ingestion routes surfaced as Druid supervisors (the
      // sys.supervisors columns users actually read; healthy follows the
      // attached query's liveness, spec payloads are not re-serialized)
      case Seq("sys", "supervisors") =>
        Some(supervisors.sortBy(_._1)
          .map { case (id, state, healthy) =>
            (id, state, state, if (healthy) 1L else 0L, "stream", id, 0L)
          }
          .toDF("supervisor_id", "state", "detailed_state", "healthy",
            "type", "source", "suspended"))
      // async SQL statements (MSQ query tasks) + JSON batch-ingestion tasks
      case Seq("sys", "tasks") =>
        Some(tasks.sortBy(_._1)
          .toDF("task_id", "type", "datasource", "status"))
      case _ => None
    }
  }

  // ------------------------------------------------------------- ingestion

  /** `INSERT INTO ds <query> PARTITIONED BY <g> [CLUSTERED BY c1, c2]` /
    * `REPLACE INTO ds OVERWRITE ALL|WHERE <time-range> <query>
    * PARTITIONED BY …` — Druid's SQL-based ingestion statements (the MSQ
    * surface a modern Druid user types instead of a JSON ingestion spec).
    * The OVERWRITE token runs up to the inner query's first keyword
    * (SELECT/WITH/TABLE/VALUES or a parenthesis), so a WHERE time range
    * never swallows the query text.
    */
  private val IngestRe =
    ("""(?is)^\s*(INSERT|REPLACE)\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+""" +
      """(?:OVERWRITE\s+(ALL|WHERE\s+.+?)\s+)?""" +
      """((?:SELECT|WITH|TABLE|VALUES|\().*?)\s+PARTITIONED\s+BY\s+""" +
      """(ALL(?:\s+TIME)?|[A-Za-z_][A-Za-z0-9_]*|'[^']+')(?:\s+CLUSTERED\s+BY\s+(.+?))?\s*$""").r

  /** Druid's canonical OVERWRITE WHERE shape: a half-open `__time` range
    * with TIMESTAMP literal bounds — what the console generates, with or
    * without the quoted `"__time"` identifier; date-only literals are
    * midnight. Anything else is loud — a free-form predicate cannot be
    * proven granularity-aligned. */
  private val OverwriteWhereRe =
    ("""(?is)^WHERE\s+(?:"__time"|__time)\s*>=\s*TIMESTAMP\s*'([^']+)'\s+AND\s+""" +
      """(?:"__time"|__time)\s*<\s*TIMESTAMP\s*'([^']+)'\s*$""").r

  /** True iff `sqlText` is an ingestion statement (INSERT/REPLACE INTO). */
  def isIngest(sqlText: String): Boolean = IngestRe.findFirstIn(sqlText).isDefined

  /** The inner query text of an ingestion statement — for dataSource
    * routing (the endpoint resolves ITS referenced tables, not the target). */
  def ingestInnerQuery(sqlText: String): Option[String] =
    IngestRe.findFirstMatchIn(sqlText).map(_.group(4))

  /** The TARGET dataSource of an ingestion statement (`sys.tasks` reports
    * it; SELECT statements have none). */
  def ingestTarget(sqlText: String): Option[String] =
    IngestRe.findFirstMatchIn(sqlText).map(_.group(2))

  private def ingestGranularity(tok: String): graft.time.Granularity = {
    import graft.time.Granularity
    val t = tok.trim
    if (t.toUpperCase(java.util.Locale.ROOT).startsWith("ALL")) Granularity.All
    else {
      val raw = if (t.startsWith("'")) t.substring(1, t.length - 1) else t
      Granularity.fromPeriod(raw)
    }
  }

  /** Execute an ingestion statement: run the inner query through the same
    * dialect path as [[run]], bucket rows into segments by the PARTITIONED
    * BY granularity of `__time` (Druid's segment-per-interval layout: one
    * parquet dir per bucket under `storeRoot/ds`), and return the task
    * report analog — (segment, rows_published) recomputed FROM THE STORE,
    * i.e. what readers will actually see. INSERT appends; REPLACE …
    * OVERWRITE ALL truncates the dataSource first, and REPLACE …
    * OVERWRITE WHERE replaces exactly the chunk-aligned time range
    * (straddling segments and out-of-range rows are loud errors).
    * CLUSTERED BY is the scale lever: one shuffle on (segment, cluster
    * keys) with an in-partition sort, so each segment's files are
    * co-located and ordered by the query keys — at 100 TB this is what
    * makes per-key reads touch one file run instead of every file.
    */
  /** Hidden same-parent siblings used by the OVERWRITE WHERE commit
    * protocol: dot-prefixed (invisible to dataSource listing and Spark
    * scans), same filesystem/parent as the target so every commit step is
    * a metadata rename. (staging, retired, journal). */
  private def whereSiblings(tp: org.apache.hadoop.fs.Path)
      : (org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path,
          org.apache.hadoop.fs.Path) =
    (new org.apache.hadoop.fs.Path(tp.getParent,
        s".staging_where_${tp.getName}"),
      new org.apache.hadoop.fs.Path(tp.getParent,
        s".retired_where_${tp.getName}"),
      new org.apache.hadoop.fs.Path(tp.getParent,
        s".journal_where_${tp.getName}"))

  /** The rename-only commit of an OVERWRITE WHERE: (1) retire every doomed
    * dir out of the store, (2) rename every staged segment dir in, (3)
    * delete retired + staging + journal. Every step skips already-done
    * work, so the SAME call both commits a live statement and rolls an
    * interrupted one forward from its journal.
    *
    * Roll-forward disambiguation (review finding r8): when a segment name
    * is BOTH doomed and staged (the common re-ingest case), a dir at that
    * name in the target is the OLD data only while its staged twin still
    * sits in staging — once the staged rename ran, the target dir IS the
    * new data and must not be re-retired (that would delete the freshly
    * committed segment on recovery after a crash between the renames and
    * the journal delete). Renames are atomic, so "staged twin present in
    * staging" is an exact witness for "target dir not yet replaced". */
  /** TEST SEAM — crash-point injection for the OVERWRITE WHERE commit
    * protocol (r8 verdict #5: the fuzz must kill the commit at a real
    * rename boundary, not only replay manufactured crash states). When
    * armed with n ≥ 0, the n-th commit-step boundary — the journal
    * publish rename, then each retire rename, each staged-move rename
    * and each cleanup delete, in execution order — throws
    * [[InjectedCrash]] BEFORE that mutation runs, exactly what a process
    * kill at that instant leaves on disk. Fires once (self-resets to
    * -1); production value -1 costs one atomic read per step. */
  private[graft] val crashAtStep =
    new java.util.concurrent.atomic.AtomicInteger(-1)
  private[graft] final class InjectedCrash
    extends RuntimeException("injected crash at OVERWRITE WHERE commit step")
  private def crashPoint(): Unit =
    if (crashAtStep.getAndUpdate(v => if (v < 0) v else v - 1) == 0)
      throw new InjectedCrash

  private def commitWhere(fs: org.apache.hadoop.fs.FileSystem,
      tp: org.apache.hadoop.fs.Path, staging: org.apache.hadoop.fs.Path,
      retired: org.apache.hadoop.fs.Path,
      journal: org.apache.hadoop.fs.Path,
      staged: Seq[org.apache.hadoop.fs.Path],
      doomed: Seq[org.apache.hadoop.fs.Path]): Unit = {
    val stagedNames = staged.map(_.getName).toSet
    if (doomed.nonEmpty && !fs.exists(retired)) fs.mkdirs(retired)
    doomed.foreach { d =>
      val replacedAlready = stagedNames.contains(d.getName) &&
        !fs.exists(new org.apache.hadoop.fs.Path(staging, d.getName))
      if (fs.exists(d) && !replacedAlready) {
        crashPoint()
        require(fs.rename(d,
            new org.apache.hadoop.fs.Path(retired, d.getName)),
          s"failed to retire doomed segment dir $d")
      }
    }
    if (!fs.exists(tp)) fs.mkdirs(tp)
    staged.foreach { s =>
      if (fs.exists(s)) {
        val dest = new org.apache.hadoop.fs.Path(tp, s.getName)
        crashPoint()
        // dest existing alongside s would mean an in-range dir escaped the
        // doomed set — loud, never Hadoop's silent move-INTO-existing-dir
        require(!fs.exists(dest) && fs.rename(s, dest),
          s"failed to move staged segment dir $s into $dest")
      }
    }
    crashPoint(); fs.delete(retired, true)
    crashPoint(); fs.delete(staging, true)
    crashPoint(); fs.delete(journal, false)
  }

  /** Recovery preamble for the journaled OVERWRITE WHERE commit — runs at
    * the start of every ingestion into `target` (the compactInPlace
    * pattern: the store self-repairs at its next control-plane touch).
    * Journal present: the crashed statement's staging was complete (the
    * journal publishes atomically AFTER the staged write), so roll its
    * commit forward — no data loss, the statement simply completes late.
    * Journal absent: staging/retired leftovers are from a statement that
    * never reached its commit point — discard staging (unknown
    * completeness), restore any retired dirs (cannot normally exist
    * without a journal; restored defensively). */
  private def recoverInterruptedWhere(
      spark: org.apache.spark.sql.SparkSession, target: String): Unit = {
    val tp = new org.apache.hadoop.fs.Path(target)
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (staging, retired, journal) = whereSiblings(tp)
    if (fs.exists(journal)) {
      val in = fs.open(journal)
      val lines = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq
      finally in.close()
      val staged = lines.filter(_.startsWith("staged ")).map(l =>
        new org.apache.hadoop.fs.Path(staging, l.stripPrefix("staged ")))
      val doomed = lines.filter(_.startsWith("doomed ")).map(l =>
        new org.apache.hadoop.fs.Path(tp, l.stripPrefix("doomed ")))
      commitWhere(fs, tp, staging, retired, journal, staged, doomed)
    } else {
      if (fs.exists(retired)) {
        fs.listStatus(retired).foreach { d =>
          val dest = new org.apache.hadoop.fs.Path(tp, d.getPath.getName)
          if (!fs.exists(dest)) fs.rename(d.getPath, dest)
        }
        fs.delete(retired, true)
      }
      if (fs.exists(staging)) fs.delete(staging, true)
      fs.delete(new org.apache.hadoop.fs.Path(
        tp.getParent, journal.getName + ".tmp"), false)
    }
  }

  def ingest(sqlText: String, frames: Map[String, DataFrame],
      storeRoot: String,
      // named approxCd: spark.sql.functions exports a deprecated
      // approxCountDistinct that would shadow the parameter
      approxCd: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.time.Granularity
    val m = IngestRe.findFirstMatchIn(sqlText).getOrElse(
      throw new IllegalArgumentException(
        "not an ingestion statement: expected INSERT INTO <ds> <query> " +
          "PARTITIONED BY <granularity> [CLUSTERED BY cols] or " +
          "REPLACE INTO <ds> OVERWRITE ALL <query> PARTITIONED BY …"))
    val mode = m.group(1).toUpperCase(java.util.Locale.ROOT)
    val ds = m.group(2)
    val overwriteTok = Option(m.group(3)).map(_.trim)
    if (mode == "REPLACE") require(overwriteTok.isDefined,
      "REPLACE INTO requires OVERWRITE ALL or OVERWRITE WHERE <__time range>")
    else require(overwriteTok.isEmpty,
      "INSERT INTO does not take OVERWRITE — use REPLACE")
    val overwriteAll = overwriteTok.exists(_.equalsIgnoreCase("ALL"))
    val g = ingestGranularity(m.group(5))
    val cluster = Option(m.group(6))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val selected = runPlan(parse(m.group(4)), frames,
      approxCountDistinct = approxCd)
    require(g == Granularity.All || selected.columns.contains("__time"),
      s"PARTITIONED BY ${g.name} needs a __time column in the SELECT " +
        s"(got: ${selected.columns.mkString(", ")})")
    val seg =
      if (g == Granularity.All) lit("all")
      else date_format(g.truncate(col("__time").cast("timestamp")),
        "yyyy-MM-dd'T'HH:mm:ss")
    val withSeg = selected.withColumn("segment", seg)
    val arranged =
      if (cluster.isEmpty) withSeg
      else withSeg.repartition((col("segment") +: cluster.map(col)): _*)
        .sortWithinPartitions(cluster.map(col): _*)
    val spark = selected.sparkSession
    val target = s"${storeRoot.stripSuffix("/")}/$ds"
    // repair an interrupted OVERWRITE WHERE of this dataSource BEFORE any
    // listing/validation below observes the store (advice r7)
    recoverInterruptedWhere(spark, target)
    // OVERWRITE WHERE: half-open [from, to) __time range — the wall-clock
    // literals are interpreted in the SESSION timezone, the same zone the
    // segment labels, truncation, and dir names live in (never the JVM
    // default, which may differ). Accepts the console's quoted "__time"
    // and date-only literals.
    val sessionZone = java.time.ZoneId.of(spark.conf.get(
      "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
    def wallInstant(s: String): java.time.Instant = {
      val ldt = try java.time.LocalDateTime.parse(s.replace(" ", "T"))
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDate.parse(s).atStartOfDay()
          catch {
            case _: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"unparseable OVERWRITE WHERE TIMESTAMP literal '$s'")
          }
      }
      ldt.atZone(sessionZone).toInstant
    }
    val overwriteRange: Option[(java.time.Instant, java.time.Instant)] =
      overwriteTok.filterNot(_.equalsIgnoreCase("ALL")).map {
        case OverwriteWhereRe(lo, hi) =>
          val (f, t) = (wallInstant(lo), wallInstant(hi))
          require(t.isAfter(f), s"OVERWRITE WHERE range is empty: [$lo, $hi)")
          (f, t)
        case other => throw new IllegalArgumentException(
          s"unsupported OVERWRITE clause '$other' — use OVERWRITE ALL or " +
            "OVERWRITE WHERE __time >= TIMESTAMP '…' AND __time < TIMESTAMP '…'")
      }
    // persist spans validation AND the write below — never computed twice;
    // the try/finally covers a validation require throwing mid-way (a
    // rejected statement must not pin cached blocks in a long-lived broker)
    overwriteRange.foreach(_ => selected.persist())
    try {
    var doomedDirs: Seq[org.apache.hadoop.fs.Path] = Nil
    overwriteRange.foreach { case (from, to) =>
      // Druid's partial-overwrite contract, enforced loudly:
      //  1. the range must align to PARTITIONED BY chunk boundaries (whole
      //     segments are replaced, never split);
      //  2. every ingested row must fall INSIDE the range — null __time
      //     included (MSQ errors on rows outside the replaced interval
      //     rather than leak them into chunks it did not clear);
      //  3. an EXISTING segment that merely OVERLAPS the range (coarser
      //     granularity from an earlier ingest) is a loud error both ways:
      //     one starting before `from` with rows inside the range would
      //     survive the dir delete and duplicate data; one being deleted
      //     with rows at/after `to` would lose data outside the range;
      //  4. the affected segment dirs are dropped, then the new rows land.
      require(g != graft.time.Granularity.All,
        "OVERWRITE WHERE needs a time-bucketed PARTITIONED BY " +
          "(use OVERWRITE ALL with PARTITIONED BY ALL)")
      Seq("start" -> from, "end" -> to).foreach { case (which, b) =>
        require(g.truncateInstant(b, sessionZone) == b,
          s"OVERWRITE WHERE $which $b does not align to a ${g.name} " +
            "chunk boundary — whole segments are replaced, never split")
      }
      val (fromTs, toTs) =
        (java.sql.Timestamp.from(from), java.sql.Timestamp.from(to))
      val inRange = col("__time").cast("timestamp") >= lit(fromTs) &&
        col("__time").cast("timestamp") < lit(toTs)
      // coalesce: a null __time is OUTSIDE every range, not a skipped row
      val outside = selected.filter(!coalesce(inRange, lit(false))).count()
      require(outside == 0,
        s"$outside rows fall outside the OVERWRITE WHERE range " +
          s"[$from, $to) — widen the range or filter the query " +
          "(Druid rejects these too)")
      val p = new org.apache.hadoop.fs.Path(target)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        // dir names and the bounds below render under the SESSION zone —
        // fail loud first if the store's marker records a different writer
        // zone (mixed-zone dirs would silently mis-match, advice r7)
        graft.sink.SegmentSink.writeTzMarker(spark, target)
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(sessionZone)
        val (lo, hi) = (fmt.format(from), fmt.format(to))
        val byName = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
          .filter(_.getName.startsWith("segment="))
          .map { d =>
            // partition dirs escape ':' as %3A — compare the VALUE
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(d.getName.stripPrefix("segment=")) -> d
          }
        // a segment=all dir (an earlier PARTITIONED BY ALL ingest) covers
        // every instant: no time range can replace it whole, and leaving
        // it would duplicate in-range rows — always loud
        require(!byName.exists(_._1 == "all"),
          "the dataSource contains an ALL-granularity segment (from a " +
            "PARTITIONED BY ALL ingest) — OVERWRITE WHERE cannot replace " +
            "part of it; use REPLACE … OVERWRITE ALL")
        // EVERY earlier dir is probed — an earlier ingest may have used an
        // arbitrarily long custom Duration chunk (PARTITIONED BY 'PT…'),
        // so no fixed look-back window is sound. The probe is a limit(1)
        // count with the time predicate pushed to parquet footers, so
        // out-of-range dirs cost metadata reads, not scans.
        val (doomed, earlier) =
          (byName.filter { case (n, _) => n >= lo && n < hi }.map(_._2),
            byName.filter { case (n, _) => n < lo }.map(_._2))
        def overlapRows(dirs: Seq[org.apache.hadoop.fs.Path],
            cond: org.apache.spark.sql.Column): Long =
          if (dirs.isEmpty) 0L
          else spark.read.parquet(dirs.map(_.toString): _*)
            .filter(cond).limit(1).count()
        // rows strictly INSIDE [from, to): an earlier coarse segment whose
        // rows all fall at/after `to` holds nothing the statement replaces
        require(overlapRows(earlier.toSeq,
            col("__time").cast("timestamp") >= lit(fromTs) &&
              col("__time").cast("timestamp") < lit(toTs)) == 0L,
          "an existing segment starting before the OVERWRITE WHERE range " +
            "contains rows inside it (coarser granularity from an earlier " +
            "ingest) — widen the range to that segment's boundary")
        require(overlapRows(doomed.toSeq,
            col("__time").cast("timestamp") >= lit(toTs)) == 0L,
          "a segment inside the OVERWRITE WHERE range contains rows at or " +
            "after its end — deleting it would lose data outside the " +
            "range; widen the range to cover the whole segment")
        // NOT deleted here: the write phase below stages the new rows
        // first, so a failure (or a cache-evicted recompute of a
        // self-REPLACE reading these dirs) cannot lose the old data
        doomedDirs = doomed.toSeq
      }
    }
    if (overwriteAll) {
      // STAGE-THEN-SWAP: the SELECT may read the target dataSource itself
      // (Druid's canonical self-REPLACE reindex) — deleting the store
      // before the plan materializes would scan a destroyed path and wipe
      // the data with nothing written back. Write the new segments to a
      // staging dir first, then swap directories; a failed write leaves
      // the original store untouched.
      val tp = new org.apache.hadoop.fs.Path(target)
      val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // dot-prefixed staging name: hidden from the dataSource namespace
      // (sqlStoreDirs skips ._-prefixed dirs, Spark scans ignore them), so
      // a half-written or crash-leaked staging dir never surfaces as a
      // queryable dataSource; a stale one from a crashed run is replaced
      // here on the next OVERWRITE ALL of the same dataSource
      val staging = new org.apache.hadoop.fs.Path(
        tp.getParent, s".staging_${tp.getName}")
      if (fs.exists(staging)) fs.delete(staging, true)
      arranged.write.mode("overwrite").partitionBy("segment")
        .parquet(staging.toString)
      // marker lands IN staging so the swap installs data+zone atomically;
      // the old store's marker (possibly a different zone) dies with it —
      // an OVERWRITE ALL legitimately re-zones the store (advice r7)
      graft.sink.SegmentSink.writeTzMarker(spark, staging.toString)
      if (fs.exists(tp)) fs.delete(tp, true)
      require(fs.rename(staging, tp),
        s"failed to swap staged segments into '$target'")
    } else if (overwriteRange.isEmpty) {
      // writes marker if absent; fails loud BEFORE data lands if this
      // session's zone differs from the store's writer zone (advice r7)
      graft.sink.SegmentSink.writeTzMarker(spark, target)
      arranged.write.mode("append").partitionBy("segment").parquet(target)
    } else {
      // OVERWRITE WHERE, crash-atomic (advice r7): stage the new rows
      // FULLY first — the SELECT may read the target itself (self-reindex)
      // and a failed write must leave the store untouched — then publish a
      // commit journal ATOMICALLY (tmp + rename), then commit with
      // directory-level renames only: retire doomed dirs into a hidden
      // sibling, rename staged segment dirs in, clean up. Old rows are
      // only RENAMED, never deleted, until every staged dir is in place; a
      // crash at any point is repaired by [[recoverInterruptedWhere]] at
      // the next ingest of this dataSource (journal absent → the commit
      // never started, stale staging discarded; journal present → staging
      // was complete, the commit rolls FORWARD to completion).
      val tp = new org.apache.hadoop.fs.Path(target)
      val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (staging, retired, journal) = whereSiblings(tp)
      if (fs.exists(staging)) fs.delete(staging, true)
      arranged.write.mode("overwrite").partitionBy("segment")
        .parquet(staging.toString)
      if (!fs.exists(tp)) fs.mkdirs(tp)
      // covers the store-did-not-exist case (validation-phase check only
      // runs when the target already exists); idempotent otherwise
      graft.sink.SegmentSink.writeTzMarker(spark, target)
      val stagedDirs = fs.listStatus(staging).filter(_.isDirectory)
        .map(_.getPath).toSeq
      val body = (stagedDirs.map(d => s"staged ${d.getName}") ++
        doomedDirs.map(d => s"doomed ${d.getName}")).mkString("\n")
      val jTmp = new org.apache.hadoop.fs.Path(
        tp.getParent, journal.getName + ".tmp")
      val os = fs.create(jTmp, true)
      try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      crashPoint() // seam: kill BEFORE the journal publishes → rolls back
      require(fs.rename(jTmp, journal),
        s"failed to publish OVERWRITE WHERE journal $journal")
      commitWhere(fs, tp, staging, retired, journal, stagedDirs, doomedDirs)
    }
    } finally overwriteRange.foreach(_ => selected.unpersist())
    // zero-row ingestion publishes zero segments (only _SUCCESS lands) —
    // Druid's contract; an unguarded read of the empty store would throw
    val tp = new org.apache.hadoop.fs.Path(target)
    val tfs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasSegments = tfs.exists(tp) && tfs.listStatus(tp).exists(_.isDirectory)
    if (!hasSegments)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("segment",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("rows_published",
            org.apache.spark.sql.types.LongType, nullable = false))))
    // partition-column type inference may read the ISO dirname back as a
    // timestamp — normalize to the written string form either way
    val segOut =
      if (g == Granularity.All) col("segment").cast("string")
      else date_format(col("segment").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss")
    spark.read.parquet(target).groupBy(segOut.as("segment"))
      .agg(count(lit(1)).as("rows_published"))
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
        // subquery plans are not children — recurse so dialect functions
        // inside scalar/IN/EXISTS subqueries rewrite too
        case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          sub.withNewPlan(dialectRewrite(sub.plan))
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
