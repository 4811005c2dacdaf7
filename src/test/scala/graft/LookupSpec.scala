package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, LookupValue}
import graft.queries.Lookups

/** LOOKUP() two-regime contract: config-sized maps inline as a literal,
  * large maps probe a broadcast HashMap ([[LookupValue]]) — identical
  * results, no giant literal in the plan, updates visible to queries
  * compiled after re-registration.
  */
class LookupSpec extends SparkSpec {

  import spark.implicits._

  private def analyzed(df: org.apache.spark.sql.DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  test("small and large lookups return identical results; plan shapes differ") {
    GraftFunctions.register(spark)
    val big = (0 until GraftFunctions.LookupInlineThreshold + 5000)
      .map(i => i.toString -> s"v$i").toMap
    val small = (0 until 50).map(i => i.toString -> s"v$i").toMap
    Lookups.register("big_lk", big)
    Lookups.register("small_lk", small)

    val keys = Seq("0", "7", "49", "12345", "nope").toDF("k")
    val viaBig = keys.selectExpr("k", "lookup(k, 'big_lk') AS v")
    val viaSmall = keys.selectExpr("k", "lookup(k, 'small_lk') AS v")

    // identical where both maps define the key; missing key → null
    val bigRows = viaBig.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val smallRows = viaSmall.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bigRows("7") == "v7" && smallRows("7") == "v7")
    assert(bigRows("12345") == "v12345") // above small's range, in big
    assert(smallRows("12345") == null && bigRows("nope") == null)

    // plan shape: the large lookup is a broadcast probe, NOT a giant
    // literal — the analyzed tree stays small and carries LookupValue
    val bigPlan = analyzed(viaBig)
    assert(bigPlan.expressions.exists(_.exists(_.isInstanceOf[LookupValue])))
    assert(bigPlan.toString.length < 10000, "plan must not inline the big map")
    // the small lookup stays a constant-foldable literal (no broadcast)
    assert(!analyzed(viaSmall).expressions
      .exists(_.exists(_.isInstanceOf[LookupValue])))

    // the probe is codegen-compatible: same result through a filter +
    // aggregate pipeline (whole-stage codegen path)
    val n = Seq.tabulate(1000)(i => i.toString).toDF("k")
      .filter(expr("lookup(k, 'big_lk') IS NOT NULL")).count()
    assert(n == 1000L)
  }

  test("re-registering a lookup bumps the version; later queries see the update") {
    GraftFunctions.register(spark)
    val v1 = (0 until 20000).map(i => i.toString -> "old").toMap
    Lookups.register("upd_lk", v1)
    val before = Seq("5").toDF("k").selectExpr("lookup(k, 'upd_lk') AS v")
      .head().getString(0)
    assert(before == "old")
    val ver1 = Lookups.entry("upd_lk").get.version

    Lookups.register("upd_lk", v1.map { case (k, _) => k -> "new" })
    assert(Lookups.entry("upd_lk").get.version > ver1)
    val after = Seq("5").toDF("k").selectExpr("lookup(k, 'upd_lk') AS v")
      .head().getString(0)
    assert(after == "new")

    Lookups.unregister("upd_lk")
    val e = intercept[Exception] {
      Seq("5").toDF("k").selectExpr("lookup(k, 'upd_lk') AS v").collect()
    }
    assert(e.getMessage.contains("not registered"))
  }

  test("3-arg LOOKUP: replaceMissingValueWith on miss, value on hit") {
    graft.functions.GraftFunctions.register(spark)
    Lookups.register("rm_lk", Map("a" -> "A"))
    try {
      val out = Seq("a", "zzz").toDF("k")
        .selectExpr("lookup(k, 'rm_lk', 'MISSING') AS v")
        .collect().map(_.getString(0)).toSeq
      assert(out == Seq("A", "MISSING"))
      // 2-arg form still yields null on miss
      val n = Seq("zzz").toDF("k").selectExpr("lookup(k, 'rm_lk') AS v")
        .head().isNullAt(0)
      assert(n)
      // non-literal replacement is loud
      assert(intercept[Exception] {
        Seq("a").toDF("k").selectExpr("lookup(k, 'rm_lk', k)").collect()
      }.getMessage.contains("literal"))
    } finally Lookups.unregister("rm_lk")
  }

  test("uri extractionNamespace loader: csv/tsv/simpleJson/customJson, " +
      "uriPrefix+fileRegex, loud failures") {
    import java.nio.file.Files
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val dir = Files.createTempDirectory("graft-lk-uri")
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      Files.writeString(p, body)
      p.toUri.toString
    }
    def load(json: String): Map[String, String] =
      Lookups.loadUriNamespace(spark, mapper.readTree(json))

    // csv with header + explicit key/value columns
    val csvUri = write("m.csv", "id,label,extra\n1,one,x\n2,two,y\n")
    assert(load(s"""{"type":"uri","uri":"$csvUri",
        "namespaceParseSpec":{"format":"csv",
          "columns":["id","label","extra"],
          "keyColumn":"id","valueColumn":"label",
          "hasHeaderRow":true}}""") == Map("1" -> "one", "2" -> "two"))

    // tsv with a custom delimiter, default key/value = first/last column
    val tsvUri = write("m.tsv", "a|x\nb|y\n")
    assert(load(s"""{"type":"uri","uri":"$tsvUri",
        "namespaceParseSpec":{"format":"tsv","delimiter":"|",
          "columns":["k","v"]}}""") == Map("a" -> "x", "b" -> "y"))

    // RFC-4180 quoting: a quoted field may contain the delimiter, and ""
    // inside quotes is a literal quote — a raw split would truncate the
    // value silently (Druid parses with a real CSV parser)
    val qUri = write("q.csv",
      "k1,\"New York, NY\"\nk2,\"say \"\"hi\"\"\"\nk3,plain\n")
    assert(load(s"""{"type":"uri","uri":"$qUri",
        "namespaceParseSpec":{"format":"csv","columns":["k","v"]}}""") ==
      Map("k1" -> "New York, NY", "k2" -> "say \"hi\"", "k3" -> "plain"))
    // tsv keeps Druid's DelimitedParser semantics: NO quote handling (a
    // quote character is data), and multi-character delimiters work
    val tq = write("tq.tsv", "k1||\"v1\"\nk2||x\n")
    assert(load(s"""{"type":"uri","uri":"$tq",
        "namespaceParseSpec":{"format":"tsv","delimiter":"||",
          "columns":["k","v"]}}""") ==
      Map("k1" -> "\"v1\"", "k2" -> "x"))

    // simpleJson: one {key: value} object per line
    val sjUri = write("m.sjson", """{"k1":"v1"}""" + "\n" + """{"k2":"v2"}""")
    assert(load(s"""{"type":"uri","uri":"$sjUri",
        "namespaceParseSpec":{"format":"simpleJson"}}""") ==
      Map("k1" -> "v1", "k2" -> "v2"))

    // customJson: named key/value fields, non-string values stringified
    val cjUri = write("m.cjson",
      """{"code":"us","name":"United States","pop":331}""" + "\n" +
      """{"code":"fr","name":"France","pop":67}""")
    assert(load(s"""{"type":"uri","uri":"$cjUri",
        "namespaceParseSpec":{"format":"customJson",
          "keyFieldName":"code","valueFieldName":"name"}}""") ==
      Map("us" -> "United States", "fr" -> "France"))

    // uriPrefix + fileRegex: later files override earlier on key collision
    write("part1.csv", "k,v\na,1\nb,2\n")
    write("part2.csv", "k,v\nb,3\nc,4\n")
    assert(load(s"""{"type":"uri","uriPrefix":"${dir.toUri}",
        "namespaceParseSpec":{"format":"csv","columns":["k","v"],
          "hasHeaderRow":true},
        "fileRegex":"part.*\\\\.csv"}""") ==
      Map("a" -> "1", "b" -> "3", "c" -> "4"))

    // loud failures: unknown format, short rows, bad namespace type
    def bad(json: String): String =
      intercept[IllegalArgumentException](load(json)).getMessage
    assert(bad(s"""{"type":"uri","uri":"$csvUri",
        "namespaceParseSpec":{"format":"xml"}}""").contains("xml"))
    assert(bad(s"""{"type":"uri","uri":"$tsvUri",
        "namespaceParseSpec":{"format":"csv","columns":["k","v"]}}""")
      .contains("columns"))
    assert(bad(s"""{"type":"uri",
        "namespaceParseSpec":{"format":"csv","columns":["k"]}}""")
      .contains("uri"))
    // pollNamespace is the dispatch surface: kafka loaders stay loud
    assert(intercept[IllegalArgumentException] {
      Lookups.pollNamespace(spark, "x", mapper.readTree("""{"type":"kafka"}"""))
    }.getMessage.contains("kafka"))
  }

  test("jdbc extractionNamespace loader: Derby poll, filter, tsColumn " +
      "freshness skip, null handling, casts, loud failures") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val dir = java.nio.file.Files.createTempDirectory("graft-lk-jdbc")
    val url = s"jdbc:derby:$dir/db"
    val c = java.sql.DriverManager.getConnection(url + ";create=true")
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE lkp (k VARCHAR(32), v VARCHAR(64), " +
      "updated_at INT)")
    st.executeUpdate("INSERT INTO lkp VALUES ('a','A',1), ('b','B',1), " +
      "(NULL,'X',1), ('c',NULL,1)")
    def ns(extra: String = ""): com.fasterxml.jackson.databind.JsonNode =
      mapper.readTree(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"},
        "table":"lkp","keyColumn":"k","valueColumn":"v"$extra}""")
    def poll(name: String, n: com.fasterxml.jackson.databind.JsonNode) =
      Lookups.pollNamespace(spark, name, n)
    try {
      // basic poll: NULL-key and NULL-value rows dropped (upstream's
      // generator skips them), the rest registered verbatim
      val m1 = poll("jdbc_t", ns()).get
      assert(m1 == Map("a" -> "A", "b" -> "B"), m1)
      Lookups.register("jdbc_t", m1)

      // filter clause reaches the fetch SQL
      val mf = poll("jdbc_f", ns(""","filter":"k <> 'b'"""")).get
      assert(mf == Map("a" -> "A"), mf)

      // tsColumn freshness: first poll loads + records the watermark;
      // an unchanged table SKIPS (None — caller keeps current version);
      // advancing MAX(ts) reloads and picks up the new row
      val tsNs = ns(""","tsColumn":"updated_at"""")
      val t1 = poll("jdbc_ts", tsNs).get
      Lookups.register("jdbc_ts", t1)
      assert(poll("jdbc_ts", tsNs).isEmpty, "unchanged table must skip")
      st.executeUpdate("INSERT INTO lkp VALUES ('d','D',7)")
      val t2 = poll("jdbc_ts", tsNs).get
      assert(t2 == Map("a" -> "A", "b" -> "B", "d" -> "D"), t2)
      // unregister clears the watermark: a re-created lookup of the same
      // name must reload even though MAX(ts) is unchanged
      Lookups.register("jdbc_ts", t2)
      assert(poll("jdbc_ts", tsNs).isEmpty)
      Lookups.unregister("jdbc_ts")
      assert(poll("jdbc_ts", tsNs).nonEmpty)
      // a name the registry has never seen (or whose load failed before
      // registration) never skips, even with a recorded-looking state
      assert(poll("jdbc_fresh", tsNs).nonEmpty)

      // an EMPTY load must not advance the watermark: the coordinator
      // rejects empty results without registering, so a skip here would
      // freeze the registered mapping behind 200-unchanged replies
      val t3 = poll("jdbc_ts", tsNs).get // re-establish the watermark
      Lookups.register("jdbc_ts", t3)
      st.executeUpdate("INSERT INTO lkp VALUES (NULL, 'ghost', 9)")
      val emptyNs = mapper.readTree(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"},
        "table":"lkp","keyColumn":"k","valueColumn":"v",
        "tsColumn":"updated_at","filter":"1 = 0"}""")
      assert(poll("jdbc_ts", emptyNs).exists(_.isEmpty))
      assert(poll("jdbc_ts", emptyNs).exists(_.isEmpty),
        "an empty load must keep reloading, never skip as unchanged")

      // the watermark is keyed by the namespace CONFIG too: re-pointing
      // the same lookup name at a different table must reload even when
      // the new table's MAX(ts) renders the same string
      st.executeUpdate("CREATE TABLE lkp2 (k VARCHAR(32), v VARCHAR(64), " +
        "updated_at INT)")
      st.executeUpdate("INSERT INTO lkp2 VALUES ('zz','ZZ', 9)")
      val t4 = poll("jdbc_ts", tsNs).get // watermark now (tsNs, 9)
      Lookups.register("jdbc_ts", t4)
      assert(poll("jdbc_ts", tsNs).isEmpty) // same config: skips
      val ns2 = mapper.readTree(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"},
        "table":"lkp2","keyColumn":"k","valueColumn":"v",
        "tsColumn":"updated_at"}""")
      val m2 = poll("jdbc_ts", ns2) // same MAX(ts)=9, different table
      assert(m2.contains(Map("zz" -> "ZZ")),
        s"config change must reload despite an equal watermark: $m2")

      // non-string columns render as strings via the Spark-side cast
      st.executeUpdate("CREATE TABLE typed (ik INT, dv DOUBLE)")
      st.executeUpdate("INSERT INTO typed VALUES (1, 2.5), (2, 3.0)")
      val mt = poll("jdbc_typed", mapper.readTree(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"},
        "table":"typed","keyColumn":"ik","valueColumn":"dv"}""")).get
      assert(mt == Map("1" -> "2.5", "2" -> "3.0"), mt)

      // end-to-end: the registered jdbc map resolves through LOOKUP()
      GraftFunctions.register(spark)
      val looked = Seq("a", "zzz").toDF("kk")
        .selectExpr("lookup(kk, 'jdbc_t') AS v").collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      assert(looked == Seq("A", null))

      // loud failures: missing connectorConfig / connectURI / table /
      // keyColumn / valueColumn
      def bad(json: String): String = intercept[IllegalArgumentException](
        poll("jdbc_bad", mapper.readTree(json))).getMessage
      assert(bad("""{"type":"jdbc"}""").contains("connectorConfig"))
      assert(bad("""{"type":"jdbc","connectorConfig":{}}""")
        .contains("connectURI"))
      assert(bad(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"}}""").contains("table"))
      assert(bad(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"},"table":"lkp"}""")
        .contains("keyColumn"))
      assert(bad(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"},"table":"lkp",
        "keyColumn":"k"}""").contains("valueColumn"))
    } finally {
      Seq("jdbc_t", "jdbc_ts", "jdbc_f", "jdbc_typed", "jdbc_fresh")
        .foreach(Lookups.unregister)
      st.close(); c.close()
      try java.sql.DriverManager.getConnection(url + ";shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}
