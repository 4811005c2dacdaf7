package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared SPARK_GRAFT_STATE_STORE handling for the stream-dedup probes —
  * one definition so the two probes' published artifact lines can never
  * diverge on backend configuration.
  *
  *  - "hdfs" (default): Spark's HDFSBackedStateStoreProvider.
  *  - "rocksdb": RocksDBStateStoreProvider WITH changelog checkpointing —
  *    the cluster-realistic commit path (per-batch incremental changelog
  *    instead of a full snapshot upload per partition per commit; measured:
  *    7 near-empty micro-batches against a bootstrapped 40k-entry store
  *    paid 178 s in snapshot uploads without it).
  *
  * Any other value is a LOUD error: a typo like "RocksDB" silently running
  * the HDFS backend would append a mislabeled benchmark line to the
  * artifact.
  */
object StateStoreEnv {
  def apply(builder: SparkSession.Builder): String = {
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs")
    stateStore match {
      case "hdfs" => // provider default
      case "rocksdb" =>
        builder.config(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        builder.config(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
      case other => throw new IllegalArgumentException(
        s"SPARK_GRAFT_STATE_STORE='$other' is not a backend (hdfs/rocksdb)")
    }
    stateStore
  }
}
