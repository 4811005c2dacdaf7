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
    val v = versions.incrementAndGet()
    registry.put(name, Entry(v, mapping))
    // drop STALE versions only — an unconditional drop could unpersist the
    // broadcast a concurrent broadcastFor just built for THIS version
    // (review finding r7)
    dropBroadcasts(name, keepAtOrAbove = v)
  }

  def unregister(name: String): Unit = {
    registry.remove(name)
    dropBroadcasts(name, keepAtOrAbove = Long.MaxValue)
    dropWatermark(name)
  }

  private def dropBroadcasts(name: String, keepAtOrAbove: Long): Unit =
    broadcasts.keys.filter(k => k._1 == name && k._2 < keepAtOrAbove)
      .foreach { k =>
        broadcasts.remove(k).foreach(_.unpersist(blocking = false))
      }

  def get(name: String): Option[Map[String, String]] =
    registry.get(name).map(_.mapping)

  def entry(name: String): Option[Entry] = registry.get(name)

  def names: Seq[String] = registry.keys.toSeq.sorted

  /** Load a Druid `uri` extractionNamespace (the lookups-cached-global
    * extension's file-backed lookups) into a mapping — one call is one
    * coordinator poll; re-POSTing the factory re-loads and version-bumps.
    * Files resolve through the Hadoop FS API (any filesystem the cluster
    * reaches — local, HDFS, object store); `uriPrefix` + `fileRegex` list a
    * directory like upstream. namespaceParseSpec formats: `csv`, `tsv`
    * (delimiter, columns, keyColumn/valueColumn, hasHeaderRow/
    * skipHeaderRows), `simpleJson` (one {"key": "value"} object per line),
    * `customJson` (keyFieldName/valueFieldName). Lookup files are
    * config-sized by contract — the driver parses lines directly; the
    * broadcast regime in [[broadcastFor]] distributes big results.
    * Malformed rows and unknown formats are loud, never silently-empty
    * registrations. */
  def loadUriNamespace(spark: SparkSession,
      ns: com.fasterxml.jackson.databind.JsonNode): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    // explicit JSON null is ABSENT, not the 4-char string "null" (Jackson
    // NullNode.asText — review finding r7; the customJson branch already
    // guards this)
    def str(n: com.fasterxml.jackson.databind.JsonNode, f: String): Option[String] =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText)
    val nsType = str(ns, "type").getOrElse("")
    require(nsType == "uri",
      s"loadUriNamespace got extractionNamespace type '$nsType' (use pollNamespace)")
    val conf = spark.sparkContext.hadoopConfiguration
    val files: Seq[org.apache.hadoop.fs.Path] =
      (str(ns, "uri"), str(ns, "uriPrefix")) match {
        case (Some(u), _) => Seq(new org.apache.hadoop.fs.Path(u))
        case (scala.None, Some(prefix)) =>
          val p = new org.apache.hadoop.fs.Path(prefix)
          val fs = p.getFileSystem(conf)
          val re = str(ns, "fileRegex").getOrElse(".*").r
          fs.listStatus(p).toSeq
            .filter(st => st.isFile &&
              re.pattern.matcher(st.getPath.getName).matches)
            .map(_.getPath).sortBy(_.getName)
        case _ => throw new IllegalArgumentException(
          "uri extractionNamespace needs 'uri' or 'uriPrefix'")
      }
    require(files.nonEmpty, "uri extractionNamespace matched no files")
    // per-file line lists: header skipping is a PER-FILE property — a
    // concatenated drop would keep the second file's header as a data row
    val fileLines: Seq[Seq[String]] = files.map { p =>
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        .filter(_.nonEmpty)
      finally in.close()
    }
    val parse = Option(ns.get("namespaceParseSpec")).getOrElse(
      throw new IllegalArgumentException(
        "uri extractionNamespace needs a namespaceParseSpec"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    str(parse, "format").getOrElse("") match {
      case f @ ("csv" | "tsv") =>
        val delim =
          if (f == "csv") "," else str(parse, "delimiter").getOrElse("\t")
        val cols = Option(parse.get("columns"))
          .map(_.elements().asScala.map(_.asText).toSeq)
          .getOrElse(throw new IllegalArgumentException(
            s"$f namespaceParseSpec needs columns"))
        val keyCol = str(parse, "keyColumn").getOrElse(cols.head)
        val valCol = str(parse, "valueColumn").getOrElse(cols.last)
        val (ki, vi) = (cols.indexOf(keyCol), cols.indexOf(valCol))
        require(ki >= 0 && vi >= 0,
          s"keyColumn '$keyCol' / valueColumn '$valCol' must appear in columns $cols")
        val skip = Option(parse.get("skipHeaderRows")).map(_.asInt).getOrElse(0) +
          (if (Option(parse.get("hasHeaderRow")).exists(_.asBoolean)) 1 else 0)
        fileLines.flatMap(_.drop(skip)).map { l =>
          // csv: RFC-4180 field split (Druid's CSVParser) — quoted fields
          // may contain the delimiter, "" inside quotes is a literal
          // quote; a raw split would silently corrupt such values.
          // tsv/delimited: PLAIN split on the (possibly multi-character)
          // delimiter, NO quote semantics — Druid's DelimitedParser
          // behavior, where a quote character is data.
          val parts =
            if (f == "csv") splitDelimited(l, ',')
            else l.split(java.util.regex.Pattern.quote(delim), -1)
          require(parts.length >= cols.length,
            s"$f row has ${parts.length} of ${cols.length} columns: $l")
          parts(ki) -> parts(vi)
        }.toMap
      case "simpleJson" =>
        fileLines.flatten.map { l =>
          val n = mapper.readTree(l)
          require(n != null && n.isObject && n.size == 1,
            s"simpleJson line must be one {key: value} object: $l")
          val e = n.properties().iterator().next()
          require(e.getValue.isTextual,
            s"simpleJson value must be a string: $l")
          e.getKey -> e.getValue.asText
        }.toMap
      case "customJson" =>
        val kf = str(parse, "keyFieldName").getOrElse(
          throw new IllegalArgumentException("customJson needs keyFieldName"))
        val vf = str(parse, "valueFieldName").getOrElse(
          throw new IllegalArgumentException("customJson needs valueFieldName"))
        fileLines.flatten.map { l =>
          val n = mapper.readTree(l)
          def field(f: String): String = Option(n.get(f)).filter(!_.isNull)
            .map(x => if (x.isTextual) x.asText else x.toString)
            .getOrElse(throw new IllegalArgumentException(
              s"customJson line lacks '$f': $l"))
          field(kf) -> field(vf)
        }.toMap
      case other => throw new IllegalArgumentException(
        s"unsupported namespaceParseSpec format '$other' " +
          "(csv/tsv/simpleJson/customJson)")
    }
  }

  /** One coordinator poll of a cachedNamespace extractionNamespace,
    * dispatched on `type`: `uri` (file-backed) always reloads; `jdbc`
    * reloads unless its `tsColumn` freshness check says the table is
    * unchanged, in which case `None` is returned and the caller keeps the
    * currently registered version (no version bump — upstream's
    * lastUpdates skip). `kafka` namespaces stay a loud error (no kafka
    * artifacts on this classpath, COVERAGE.md). */
  def pollNamespace(spark: SparkSession, lookupName: String,
      ns: com.fasterxml.jackson.databind.JsonNode): Option[Map[String, String]] =
    Option(ns.get("type")).filterNot(_.isNull).map(_.asText).getOrElse("") match {
      case "uri" => Some(loadUriNamespace(spark, ns))
      case "jdbc" => loadJdbcNamespace(spark, lookupName, ns)
      case other => throw new IllegalArgumentException(
        s"unsupported extractionNamespace type '$other' (uri/jdbc — no " +
          "kafka loader in this engine)")
    }

  // last successful MAX(tsColumn) watermark per lookup NAME, stored with a
  // FINGERPRINT of the namespace config that produced it — the freshness
  // state behind upstream's lastUpdates skip. The fingerprint guards
  // re-pointing: a re-POST that changes the table/connectURI/columns/
  // filter must reload even when the new table's MAX(ts) happens to render
  // the same string (review r9 — small version counters make that
  // realistic). A name's watermark is only consulted while that name is
  // still registered.
  private val jdbcWatermarks = TrieMap.empty[String, (String, String)]

  /** Load a Druid `jdbc` extractionNamespace (the lookups-cached-global
    * extension's JDBC-backed lookups, upstream
    * `lookups-cached-global/.../JdbcCacheGenerator` semantics): one call is
    * one coordinator poll of
    * `SELECT keyColumn, valueColumn FROM table [WHERE filter]` through
    * Spark's own JDBC source (`spark.read.format("jdbc")` — the driver
    * class resolves from the URL via DriverManager; the Derby engine on
    * Spark's classpath makes `jdbc:derby:` work out of the box). Behaviors
    * kept from upstream:
    *  - `tsColumn` freshness: the poll first reads `MAX(tsColumn)` (whole
    *    table — upstream's check ignores `filter`) and SKIPS the reload
    *    (returns None; the caller keeps the current version) when it equals
    *    the previous successful poll's watermark for this lookup name.
    *    Deletions that leave MAX(ts) unchanged are invisible until a row
    *    advances it — upstream's documented limitation too.
    *  - rows whose key or value is NULL are dropped (upstream's generator
    *    skips them); keys and values are rendered as strings (Druid
    *    lookups are string→string) by a Spark-side cast, so numeric /
    *    timestamp columns format consistently across JDBC drivers.
    *  - duplicate keys: last row wins (upstream map.put order).
    * `pollPeriod`/`jitterSeconds`/`maxHeapPercentage` parse but don't
    * schedule anything — this engine's contract is one POST = one poll.
    * Lookup tables are config-sized by contract — the single-partition
    * read collects to the driver; the broadcast regime in [[broadcastFor]]
    * distributes big results to executors. */
  def loadJdbcNamespace(spark: SparkSession, lookupName: String,
      ns: com.fasterxml.jackson.databind.JsonNode): Option[Map[String, String]] = {
    def str(n: com.fasterxml.jackson.databind.JsonNode, f: String): Option[String] =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText)
    val conn = Option(ns.get("connectorConfig")).filterNot(_.isNull).getOrElse(
      throw new IllegalArgumentException(
        "jdbc extractionNamespace needs a connectorConfig"))
    val uri = str(conn, "connectURI").getOrElse(
      throw new IllegalArgumentException(
        "jdbc extractionNamespace needs connectorConfig.connectURI"))
    val table = str(ns, "table").getOrElse(throw new IllegalArgumentException(
      "jdbc extractionNamespace needs a table"))
    val keyCol = str(ns, "keyColumn").getOrElse(
      throw new IllegalArgumentException(
        "jdbc extractionNamespace needs a keyColumn"))
    val valCol = str(ns, "valueColumn").getOrElse(
      throw new IllegalArgumentException(
        "jdbc extractionNamespace needs a valueColumn"))
    val filter = str(ns, "filter").filter(_.nonEmpty)

    def read(query: String): org.apache.spark.sql.DataFrame = {
      val r = spark.read.format("jdbc")
        .option("url", uri).option("query", query)
      val r2 = str(conn, "user").fold(r)(r.option("user", _))
      str(conn, "password").fold(r2)(r2.option("password", _)).load()
    }

    val mxOpt = str(ns, "tsColumn").filter(_.nonEmpty).map { tsCol =>
      // aliased: some engines (Derby) label an unaliased aggregate "1" in
      // ResultSet metadata, which is not re-selectable by name when Spark
      // builds the fetch query around the subquery
      read(s"SELECT MAX($tsCol) AS mx FROM $table").collect().headOption
        .map(r => if (r.isNullAt(0)) "<empty>" else String.valueOf(r.get(0)))
        .getOrElse("<empty>")
    }
    val fingerprint = ns.toString
    val unchanged = mxOpt.exists(mx =>
      jdbcWatermarks.get(lookupName).contains((fingerprint, mx)) &&
        registry.contains(lookupName))
    if (unchanged) scala.None
    else {
      // column POSITIONS, not labels: drivers case-fold unquoted
      // identifiers in ResultSet metadata (Derby upper-cases), and
      // keyColumn == valueColumn would alias-collide — toDF renames
      // positionally past both
      val where = filter.map(f => s" WHERE $f").getOrElse("")
      val rows = read(s"SELECT $keyCol, $valCol FROM $table$where")
        .toDF("k", "v")
        .select(org.apache.spark.sql.functions.col("k").cast("string"),
          org.apache.spark.sql.functions.col("v").cast("string"))
        .where("k IS NOT NULL AND v IS NOT NULL")
        .collect()
      // watermark advances only on a load the caller can ACCEPT: a failed
      // reload must not make the next poll skip, and neither may an EMPTY
      // one — the coordinator rejects empty results without registering,
      // so advancing here would freeze the previously registered mapping
      // behind 200-unchanged replies (review r9)
      if (rows.nonEmpty)
        mxOpt.foreach(mx => jdbcWatermarks.put(lookupName, (fingerprint, mx)))
      Some(rows.map(r => r.getString(0) -> r.getString(1)).toMap)
    }
  }

  /** Clears the tsColumn freshness watermark for a name — called on
    * unregister so a re-created lookup never sees a stale skip. */
  private def dropWatermark(name: String): Unit = jdbcWatermarks.remove(name)

  /** RFC-4180 line split: unquoted delimiters separate fields; a field
    * starting with `"` runs to its closing quote ("" = literal quote) and
    * the delimiter inside it is data. An unterminated quote falls back to
    * taking the rest of the line as the field (loud enough downstream via
    * the column-count require). */
  private[queries] def splitDelimited(line: String, delim: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    var inQuotes = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            cur.append('"'); i += 1
          } else inQuotes = false
        } else cur.append(c)
      } else if (c == '"' && cur.length() == 0) inQuotes = true
      else if (c == delim) { out += cur.toString; cur.setLength(0) }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.toArray
  }

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
    // re-validate: a concurrent unregister (or a re-register that bumped
    // the version) may have raced the insert above — the cache entry would
    // otherwise be keyed to a dead version and leak for the JVM lifetime
    // (review finding r7)
    registry.get(name) match {
      case Some(cur) if cur.version == e.version => (e.version, bc)
      case _ =>
        broadcasts.remove((name, e.version))
          .foreach(_.unpersist(blocking = false))
        (e.version, bc) // still usable by THIS caller; just not cached
    }
  }
}
