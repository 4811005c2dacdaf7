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
}
