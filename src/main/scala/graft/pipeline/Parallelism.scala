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

  /** Repartition `df` up to the cluster's default parallelism when its
    * PLANNED partitioning is narrower; no-op (and no extra shuffle) when
    * the input already fans at least that wide.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val planned = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .rdd.getNumPartitions
    if (planned < target) df.repartition(target) else df
  }
}
