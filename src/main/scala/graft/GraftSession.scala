package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify, Bench and tests agree.
  *
  * Scale notes: shuffle partitions sized to local cores here; on a real
  * cluster this would be `spark.sql.shuffle.partitions` ≈ 2-3× total cores
  * plus AQE coalescing (enabled) to right-size post-shuffle partitions at
  * 100 TB. `nanosAsLong` is required to read the ns-timestamp events table.
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
      .config("spark.ui.enabled", "false")

  def create(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
