package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.ChangeEnvelope

/** Listening-mode surface (reference O1): change-event envelopes →
  * flattened typed stream.
  *
  * The reference embeds a Debezium engine in-process
  * (`listening/ChangeDataCapture.java:83-99`). This offline build cannot
  * ship Debezium, so the Spark-first equivalent is: any transport that
  * lands Debezium-shaped envelope records (Kafka topic, file drop, or the
  * test replay fixture) becomes a streaming DataFrame with
  * [[graft.core.ChangeEnvelope.schema]], and the flatten kernel produces
  * the exact reference payloads. The engine-specific part of the
  * reference (envelope → rows) is fully covered; the transport is
  * pluggable — `readStream.format("kafka")` in production,
  * `readStream.json(dir)` for replay.
  */
object EnvelopeStream {

  /** Replay envelope JSON files (e.g. Debezium-exported records) from a
    * directory as a change stream. */
  def replay(spark: SparkSession, dir: String, rowSchema: StructType): DataFrame =
    spark.readStream
      .schema(ChangeEnvelope.schema(rowSchema))
      .json(dir)

  /** Flatten per the user's `operation` selection — see
    * [[graft.core.ChangeEnvelope.flatten]]. */
  def flatten(envelopes: DataFrame, rowSchema: StructType, operation: String): DataFrame =
    ChangeEnvelope.flatten(envelopes, rowSchema, operation)
}
