package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify, Bench and tests agree.
  *
  * Scale notes: shuffle partitions sized to local cores here; on a real
  * cluster this would be `spark.sql.shuffle.partitions` ≈ 2-3× total cores
  * plus AQE coalescing (enabled) to right-size post-shuffle partitions at
  * 100 TB. `nanosAsLong` is required to read the ns-timestamp events table.
  *
  * State store: RocksDB, not the default HDFS-backed in-memory provider —
  * the stateful streaming operators (pattern twins, streaming dedup,
  * as-of join) keep one entry per open key, and at 100 TB key cardinality
  * an executor-heap-bounded map is the first thing to fall over. RocksDB
  * spills state to local disk with bounded block-cache memory
  * (`boundedMemoryUsage`), so state scales with disk, not heap; changelog
  * checkpointing keeps commits incremental.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")

  def create(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
