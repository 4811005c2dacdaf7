package graft

/** Registry-wide guardrails: every declared query must analyze and execute on
  * the smallest testdata, with unique column names (the driver's compare
  * sorts columns by name — duplicates would garble it) and no duplicate
  * query names. This is the cheap local twin of the driver's t1 smoke.
  */
class RegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.registry.foreach { q =>
    test(s"query runs on sf0.001: ${q.name}") {
      val df = q.run(spark, sf)
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"duplicate columns: $cols")
      df.count() // forces full execution
    }
  }

  test("entry returns rows with a bare session (driver t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
