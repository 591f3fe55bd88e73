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

  /** Full listening mode (reference O1) when Debezium jars are present at
    * runtime: starts the embedded engine via [[DebeziumRuntime]] spooling
    * envelope JSON under `stateDir/spool`, and returns that spool as the
    * envelope stream plus the engine handle (close it when the query
    * stops). Without the jars this throws with the replay/polling
    * guidance — the rest of the pipeline (flatten, offsets, checkpoint
    * recovery) is byte-identical between live tail and replay. */
  def listen(spark: SparkSession, opts: graft.sources.CdcOptions,
             rowSchema: StructType, stateDir: String)
  : (DataFrame, DebeziumRuntime.Handle) = {
    val handle = DebeziumRuntime.start(
      DebeziumRuntime.engineProps(opts, stateDir), s"$stateDir/spool")
    (replay(spark, s"$stateDir/spool", rowSchema), handle)
  }
}
