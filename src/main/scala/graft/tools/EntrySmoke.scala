package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's t1 smoke: a bare SparkSession (none of our confs)
  * calling SparkEntry.entry — guards against the flagship query depending on
  * session state only our own mains set.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
    assert(n > 0, "entry returned no rows")
  }
}
