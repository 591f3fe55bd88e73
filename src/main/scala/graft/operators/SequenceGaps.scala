package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed sequence-gap detection (reference O15,
  * `WaitOnMissingRecordPollingStrategy.java:116-132`, and SURVEY §2.3 Q5).
  *
  * The naive formulation — `LEAD(id) OVER (ORDER BY id)` — is a GLOBAL
  * window: Spark moves every row to a single partition to sort it
  * (WindowExec warns exactly this), which is a non-starter at 100 TB.
  *
  * This operator keeps the same semantics with a scalable plan:
  *   1. `repartitionByRange(id)` + `sortWithinPartitions(id)` — a range
  *      shuffle, each partition holds a contiguous id range;
  *   2. one pass per partition emits in-partition gaps AND one boundary
  *      record (partitionId, firstId, lastId);
  *   3. boundary records (numPartitions rows — trivially small) are
  *      broadcast-joined back to close the cross-partition seams.
  *
  * Wall-clock is one range shuffle + one linear scan; no single-node
  * sort, no driver collect of data rows.
  */
object SequenceGaps {

  /** Missing ranges `(missing_from, missing_to)` of the distinct values of
    * `idCol` (values are assumed unique, e.g. a polling column). */
  def detect(df: DataFrame, idCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.select(col(idCol).cast("long").as("id"))
      .repartitionByRange(n, col("id"))
      .sortWithinPartitions("id")

    // pass 2: per-partition linear scan -> (kind=0 gaps | kind=1 boundaries)
    // encoded as (kind, a, b, pid): gap=(from,to), boundary=(first,last)
    val scanned = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      if (!it.hasNext) Iterator.empty
      else {
        var first = Long.MinValue
        var prev = Long.MinValue
        val gaps = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
        it.foreach { r =>
          val v = r.getLong(0)
          if (first == Long.MinValue) first = v
          else if (v - prev > 1) gaps += ((0, prev + 1, v - 1, pid))
          prev = v
        }
        gaps.iterator ++ Iterator((1, first, prev, pid))
      }
    // localCheckpoint, not cache(): both branches below read this twice,
    // but CacheManager entries outlive the query and accumulate in a
    // long-lived session; a localCheckpoint is freed by the ContextCleaner
    // as soon as the plan is unreferenced.
    }.toDF("kind", "a", "b", "pid").localCheckpoint()

    val inPartGaps = scanned.where(col("kind") === 0)
      .select(col("a").as("missing_from"), col("b").as("missing_to"))

    // pass 3: seams between consecutive non-empty partitions. Boundary set
    // is O(numPartitions) -> a window over it is effectively free.
    val bounds = scanned.where(col("kind") === 1)
      .select(col("pid"), col("a").as("first"), col("b").as("last"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("pid")
    val seamGaps = bounds
      .withColumn("next_first", lead(col("first"), 1).over(w))
      .where(col("next_first").isNotNull && col("next_first") - col("last") > 1)
      .select((col("last") + 1).as("missing_from"), (col("next_first") - 1).as("missing_to"))

    inPartGaps.union(seamGaps)
  }
}
