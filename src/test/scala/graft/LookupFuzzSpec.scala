package graft

import scala.util.Random

import graft.queries.Lookups

/** Model-based fuzz of the JDBC-lookup poll lifecycle — the watermark
  * state machine is exactly where the r9 review found two real bugs
  * (empty-load advance; name-only keying), so its interleavings get the
  * same treatment the task-API control plane got in r8: seeded random
  * op sequences (mutate table / poll either of two configs / register /
  * unregister) against an INDEPENDENT model that re-derives the expected
  * poll outcome from first principles each step:
  *  - expected mapping = the table's non-NULL (k, v) rows under the
  *    config's filter, last row wins per scan is irrelevant (keys unique
  *    by construction here);
  *  - a poll SKIPS (None) iff the lookup name is registered AND the last
  *    successful non-empty load for this name used the SAME config AND
  *    the table's MAX(ts) is unchanged since it;
  *  - everything else reloads, and only a non-empty reload may arm the
  *    skip for the next poll.
  * Each assertion failure prints the seed + op trace for replay
  * (-Dgraft.lookupfuzz.only=seed).
  */
class LookupFuzzSpec extends SparkSpec {

  private val Sequences = 120
  private val OpsPerSeq = 10

  test("jdbc poll lifecycle: model ≡ engine over seeded op sequences") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val dir = java.nio.file.Files.createTempDirectory("graft-lk-fuzz")
    val url = s"jdbc:derby:$dir/db"
    val c = java.sql.DriverManager.getConnection(url + ";create=true")
    val st = c.createStatement()
    st.executeUpdate(
      "CREATE TABLE fz (k VARCHAR(16), v VARCHAR(32), ts INT)")
    val only = sys.props.get("graft.lookupfuzz.only").map(_.toLong)

    // two configs over the SAME table: B adds a filter, so switching
    // between them exercises the fingerprint keying
    def ns(filtered: Boolean): com.fasterxml.jackson.databind.JsonNode =
      mapper.readTree(s"""{"type":"jdbc",
        "connectorConfig":{"connectURI":"$url"},
        "table":"fz","keyColumn":"k","valueColumn":"v","tsColumn":"ts"
        ${if (filtered) ""","filter":"k <> 'x0'"""" else ""}}""")
    val nsA = ns(filtered = false)
    val nsB = ns(filtered = true)

    try {
      val seeds = Seq.tabulate(Sequences)(i => 41000L + i)
      for (seed <- seeds if only.forall(_ == seed)) {
        val rnd = new Random(seed)
        val name = s"fz_$seed"
        // model state
        var rows = Map.empty[String, (String, Int)] // k -> (v, ts)
        var registered = false
        // armed skip state: (filtered?, maxTsAtLoad) of the last
        // successful NON-EMPTY load for this name
        var armed: Option[(Boolean, Option[Int])] = None
        def maxTs: Option[Int] =
          if (rows.isEmpty) scala.None else Some(rows.values.map(_._2).max)
        def expected(filtered: Boolean): Map[String, String] =
          rows.collect { case (k, (v, _)) if !(filtered && k == "x0") =>
            k -> v }
        val trace = new StringBuilder
        st.executeUpdate("DELETE FROM fz")

        var step = 0
        while (step < OpsPerSeq) {
          step += 1
          rnd.nextInt(6) match {
            case 0 | 1 => // mutate the table (insert/overwrite a row)
              val k = s"x${rnd.nextInt(4)}"
              val v = s"v${rnd.nextInt(100)}"
              val ts = rnd.nextInt(5)
              trace ++= s"put($k,$v,$ts); "
              st.executeUpdate(s"DELETE FROM fz WHERE k = '$k'")
              st.executeUpdate(s"INSERT INTO fz VALUES ('$k','$v',$ts)")
              rows += (k -> (v, ts))
            case 2 => // delete a row
              val k = s"x${rnd.nextInt(4)}"
              trace ++= s"del($k); "
              st.executeUpdate(s"DELETE FROM fz WHERE k = '$k'")
              rows -= k
            case 3 => // unregister (also clears the engine watermark)
              trace ++= "unregister; "
              Lookups.unregister(name)
              registered = false
              armed = scala.None
            case _ => // poll one of the two configs, maybe register
              val filtered = rnd.nextBoolean()
              trace ++= s"poll(${if (filtered) "B" else "A"}); "
              val got = Lookups.pollNamespace(spark, name,
                if (filtered) nsB else nsA)
              val exp = expected(filtered)
              val shouldSkip = registered &&
                armed.contains((filtered, maxTs))
              if (shouldSkip)
                assert(got.isEmpty,
                  s"seed=$seed expected SKIP, got $got; trace: $trace")
              else {
                assert(got.contains(exp),
                  s"seed=$seed expected reload $exp, got $got; trace: $trace")
                if (exp.nonEmpty) armed = Some((filtered, maxTs))
                // empty loads must NOT arm (review r9 #1) — and must not
                // DISARM either: the engine keeps the old watermark entry
              }
              if (got.nonEmpty && got.get.nonEmpty && rnd.nextBoolean()) {
                trace ++= "register; "
                Lookups.register(name, got.get)
                registered = true
              }
          }
        }
        Lookups.unregister(name)
      }
    } finally {
      st.close(); c.close()
      try java.sql.DriverManager.getConnection(url + ";shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}
