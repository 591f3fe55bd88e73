package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum — "total of every value strictly
  * BEFORE this row" in a global `orderCol` order.
  *
  * The naive `sum(v).over(Window.orderBy(o))` has no partition key, so
  * Spark plans ONE task holding the whole corpus — the single-partition
  * window trap. Decomposed instead like [[SequenceGaps]]:
  *
  *   1. equi-count range blocks of the order key from a bounded
  *      micro-bucket histogram ([[SequenceGaps.equiCountBounds]]) —
  *      order is preserved BETWEEN blocks by construction;
  *   2. a parallel within-block running sum (window partitioned by
  *      block);
  *   3. block totals (≤ n rows) fold into per-block starting offsets —
  *      the only unpartitioned window runs over this bounded tiny set,
  *      never the corpus — and broadcast back onto the rows.
  *
  * Deterministic for unique order keys at any parallelism. This is the
  * device behind sequence packing (p28): token offsets in a global
  * document order, at shuffle cost of one window + one broadcast.
  */
object PrefixSum {

  /** Input plus `out` = sum of `valueCol` over all rows strictly before
    * this row in ascending `orderCol` order (0 for the first row).
    * `orderCol` must be castable to long and unique; `valueCol` must be
    * integral (the running total is exact long arithmetic). */
  def runningBefore(df: DataFrame, orderCol: String, valueCol: String,
                    out: String, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // one cast, used everywhere order matters: bounds come from the long
    // view, so the block-id comparison and the window orderBy must see the
    // SAME long value — the raw column would compare lexically for string
    // order keys ("10" < "9"), silently scrambling block membership and
    // within-block order against the numeric bounds
    val ord = col(orderCol).cast("long")
    val bounds = SequenceGaps.equiCountBounds(df.select(ord.as("id")), n)
    val wBlk = Window.partitionBy("_blk").orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = df
      .withColumn("_blk", SequenceGaps.blockIdExpr(bounds, ord))
      .withColumn("_cum", sum(col(valueCol).cast("long")).over(wBlk))
    // per-block totals: bounded at n rows, so THIS unpartitioned window
    // is a driver-sized fold, not the corpus-sized trap above
    val wOff = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withCum.groupBy("_blk")
      .agg(sum(col(valueCol).cast("long")).as("_bsum"))
      .withColumn("_boff", coalesce(sum("_bsum").over(wOff), lit(0L)))
      .select("_blk", "_boff")
    withCum.join(broadcast(offsets), "_blk")
      .withColumn(out, col("_boff") + col("_cum") - col(valueCol).cast("long"))
      .drop("_blk", "_cum", "_boff")
  }
}
