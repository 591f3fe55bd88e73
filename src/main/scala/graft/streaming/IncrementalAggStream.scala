package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live maintenance of [[graft.operators.IncrementalAgg]]'s FINEST level —
  * the streaming half of Siddhi's incremental aggregation (its
  * IncrementalExecutor aggregates arriving events into the second/minute/
  * hour buckets in-memory and flushes each bucket as its time closes;
  * coarser levels re-aggregate below).
  *
  * This one is deliberately NOT a custom stateful operator: a tumbling
  * event-time window aggregation is exactly what Structured Streaming's
  * built-in watermark + `window()` + partial aggregation does best (state
  * = one aggregate row per open (key, bucket), map-side combine before
  * the shuffle, bucket emitted once when the watermark passes its end —
  * in Append mode the emitted cell is FINAL, which is what a persisted
  * ladder level needs). Custom `flatMapGroupsWithState` machinery would
  * re-implement precisely this contract with none of the built-in's
  * codegen or state-format guarantees; the pattern family reaches for it
  * only where built-ins cannot express the semantics
  * ([[StreamPatterns]]).
  *
  * Output: (key, bucket_start, cnt, sum_dec) — the same cell schema as
  * the batch ladder's finest level, decimal-exact, so a `foreachBatch`
  * appending these cells to the persisted level (and re-aggregating the
  * coarser levels, cell-sized work) keeps the whole ladder live.
  */
object IncrementalAggStream {

  /** `events` must carry an event-time TIMESTAMP column `tsCol`; `granUs`
    * is the finest bucket width in µs (must be whole seconds — the
    * built-in window duration grammar). */
  def finestLevel(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, granUs: Long, delay: String): DataFrame = {
    require(granUs > 0 && granUs % 1000000L == 0,
      s"bucket width must be whole seconds in µs, got $granUs")
    events
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), window(col(tsCol), s"${granUs / 1000000L} seconds"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_dec"))
      .select(col(keyCol), unix_micros(col("window.start")).as("bucket_start"),
        col("cnt"), col("sum_dec"))
  }
}
