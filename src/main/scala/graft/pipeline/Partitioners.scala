package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.time.Granularity

/** Partitioning strategies (SURVEY §2.10) as repartition expressions.
  *
  * Upstream: beam/HashPartitionBeam.scala (abs(hashCode) % n),
  * partition/Partitioner.scala + HashCodePartitioner.scala (typeclass),
  * partition/GenericTimeAndDimsPartitioner.scala (hash of truncated ts +
  * sorted dim values — colocates rows that will collapse under rollup),
  * beam/RoundRobinBeam.scala.
  *
  * Spark-first: a partitioner is just an expression handed to
  * `Dataset.repartition(n, expr)` — the shuffle writer hashes it. For the
  * rollup path Catalyst already shuffles on the grouping key (no explicit
  * partitioner needed); these exist for the isRollup=false raw-append path
  * and for sinks that want stable file-to-key affinity at 100 TB.
  */
object Partitioners {

  /** HashPartitionBeam analog: stable hash of the given columns. */
  def hashPartition(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** GenericTimeAndDimsPartitioner analog: hash of (truncated ts, dims…). */
  def timeAndDims(g: Granularity, ts: Column, dims: Seq[Column]): Column =
    xxhash64(g.truncate(ts) +: dims: _*)

  def repartitionByHash(df: DataFrame, n: Int, cols: Seq[Column]): DataFrame =
    df.repartition(n, hashPartition(cols))

  def repartitionByTimeAndDims(df: DataFrame, n: Int, g: Granularity,
      ts: Column, dims: Seq[Column]): DataFrame =
    df.repartition(n, timeAndDims(g, ts, dims))

  /** RoundRobinBeam analog: even spread, no key affinity. */
  def roundRobin(df: DataFrame, n: Int): DataFrame = df.repartition(n)
}
