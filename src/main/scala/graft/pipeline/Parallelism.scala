package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Input-layout decoupling for compute-dense stages.
  *
  * Found by the ×30 scale probe: a dup-heavy corpus compresses brutally
  * (150k replicated documents → ONE 1.9 MB parquet file), so the scan plans
  * a single partition and everything up to the first shuffle — shingling,
  * minhash signatures, n-gram explosion, the expensive per-row work — runs
  * on one core. Measured on the probe corpus: decontamination 66 s single-
  * partition vs 5.8 s after one repartition (local[32]).
  *
  * At 100 TB the same pattern appears wherever bytes-on-disk understate
  * compute: highly-compressible text, columnar projections of a few small
  * columns, post-filter slivers feeding heavy UDF-ish stages. Splitting
  * can't help (a small file is one row group); AQE can't re-split a scan.
  * The fix is one ROUND-ROBIN shuffle of the raw rows — data-proportional
  * and narrow — amortized by the downstream per-row work it parallelizes.
  */
object Parallelism {

  private def target(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  private def planned(df: DataFrame): Int =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .rdd.getNumPartitions

  /** `spark.graft.fanout=off` turns every fanOut into a no-op — the A/B
    * seam scale probes flip without a rebuild (never set in production). */
  private def disabled(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.fanout").contains("off")

  /** Repartition `df` up to the cluster's default parallelism when its
    * PLANNED partitioning is narrower; no-op (and no extra shuffle) when
    * the input already fans at least that wide.
    *
    * Prefer the keyed overload. This round-robin form pays a hidden
    * per-partition SORT of the full rows before the exchange
    * (`spark.sql.execution.sortBeforeRepartition`, on by default since
    * SPARK-23207 so retried map tasks reproduce the same row-to-partition
    * assignment) — on the exact input this helper exists for (a corpus
    * compressed into ONE scan partition) that sort is itself single-core
    * and proportional to full row width, i.e. it re-serializes part of the
    * cost the fan-out is meant to remove.
    */
  def fanOut(df: DataFrame): DataFrame =
    if (!disabled(df) && planned(df) < target(df))
      df.repartition(target(df)) else df

  /** Keyed fan-out: hash-repartition on a deterministic high-cardinality
    * key (doc/vec id). Same no-op guard as the round-robin form, two
    * strict improvements (guide §2.5): no sort-before-repartition (hash
    * placement is reproducible under task retry by construction, so
    * Spark plans a plain Exchange hashpartitioning), and retry safety on
    * clusters does not rest on the sort at all. Key cardinality (unique
    * ids) exceeds any sane partition count by orders of magnitude, so the
    * hash spreads evenly.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    if (disabled(df) || planned(df) >= target(df)) df
    // `spark.graft.fanout.mode=rr` restores the round-robin exchange — the
    // attribution seam for the A/B that measured hash-vs-rr (never set in
    // production; hash is strictly better on both counts above)
    else if (df.sparkSession.conf.getOption("spark.graft.fanout.mode")
               .contains("rr")) df.repartition(target(df))
    else df.repartition(target(df), key)
}
