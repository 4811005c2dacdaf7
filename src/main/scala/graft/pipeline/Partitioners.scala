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

  /** Skew-relief equi join (100 TB tool): a hot key that would pile one
    * reducer with most of the fact table is spread across `salt` sub-keys;
    * the other side — small enough to replicate `salt`×, too big or too
    * dynamic to broadcast — is exploded over every salt value, so the join
    * key becomes (key, salt) and the hot key's rows land on `salt` reducers.
    *
    * Result-identical to `fact.join(dim, key)`: every fact row matches
    * exactly the dim rows it would have matched (each under one salt value).
    * Duplicate dim keys are fine — replication is per dim row. AQE's skew
    * split covers sort-merge joins adaptively; salting stays the explicit
    * tool when the skew is known ahead (and for deterministic layouts).
    *
    * The salt assignment only spreads rows — any per-row value works; it
    * hashes a unique id so runs are reproducible modulo row order.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, s"salt must be > 1, got $salt")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
