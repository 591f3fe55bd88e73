package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): these are plain parquet scans, so Catalyst
  * predicate pushdown / column pruning applies to every downstream query;
  * at cluster scale the same call sites would point at partitioned
  * object-store tables and nothing else changes.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Events with a canonical `ts_ns` (epoch nanos, Long) column derived
    * from whatever physical shape the driver generated `ts` in — the
    * Aug-13 regeneration switched it from TIMESTAMP(NANOS) (read as a
    * long under `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[GraftSession]]) to a plain µs TIMESTAMP_NTZ. All downstream
    * queries key off `ts_ns`/`ts_us`, so every shape normalizes here:
    *   - Long (legacy nanos): exact nanos pass through.
    *   - TIMESTAMP_NTZ (current): µs wall-clock; the session timezone is
    *     pinned UTC, so the NTZ→LTZ cast is instant-preserving and
    *     `unix_micros·1000` equals DuckDB's `epoch_us(ts)·1000` — the
    *     oracle reads the identical parquet as a naive µs timestamp.
    *   - TIMESTAMP (LTZ): `unix_micros` directly.
    * `ts` itself stays a calendar timestamp for bucketing queries. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
