package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sequence-gap detection (reference O15,
  * `WaitOnMissingRecordPollingStrategy.java:116-132`, and SURVEY §2.3 Q5).
  *
  * The naive formulation — `LEAD(id) OVER (ORDER BY id)` — is a GLOBAL
  * window: Spark moves every row to a single partition to sort it, a
  * non-starter at 100 TB.
  *
  * This operator keeps the same semantics with a scalable, deterministic
  * plan:
  *   1. one column-pruned histogram pass: counts per fine-grained
  *      equal-width micro-bucket (64 per target block — O(64·blocks)
  *      longs to the driver, bounded like a range-partitioner sample but
  *      DETERMINISTIC: exact counts, not samples). The driver greedily
  *      merges micro-buckets into ~`numBlocks` balanced block bounds, so
  *      the block of an id is a pure function of (bounds) and
  *      re-executions of the shared subplan below partition identically —
  *      a sampled repartitionByRange could not guarantee that without
  *      persisting the shuffle. Balance is by COUNT, not id-range: a
  *      single outlier id (e.g. one epoch-µs value amid small integers)
  *      stretches the range but not the histogram, so skewed
  *      distributions still split into even blocks instead of collapsing
  *      into one;
  *   2. hash-repartition on block id + sort within partitions: one pass
  *      per partition emits in-block gaps AND one boundary record
  *      (blk, firstId, lastId) per block;
  *   3. boundary records (numBlocks rows — trivially small) fold into
  *      cross-block seam gaps with a single-partition linear scan (no
  *      global window, so no WindowExec single-partition warning and the
  *      O(blocks) seam cost is explicit).
  *
  * Wall-clock is one column-pruned histogram scan + one shuffle + one
  * linear scan; no single-node sort, no driver collect of data rows, no
  * persisted state (both consumers of the scanned stream recompute it; the
  * exchange is reused by Catalyst within the one query, and determinism of
  * step 1 makes even independent re-executions agree).
  */
object SequenceGaps {

  private val MicroBucketsPerBlock = 64

  /** Deterministic equi-count block BOUNDS (the first id of each block
    * after the first) for a long column named `id`, from a bounded
    * micro-bucket histogram (≤ n·64 driver rows) — pass 1 of the gap
    * scan, shared with [[PrefixSum]]'s global-order decomposition.
    * Empty input → no bounds. */
  private[operators] def equiCountBounds(ids: DataFrame, n: Int): Vector[Long] = {
    // deterministic micro-bucket histogram (bounded driver data)
    val micro = n * MicroBucketsPerBlock
    val stats = ids.agg(min(col("id")).as("lo"), max(col("id")).as("hi")).head()
    if (stats.isNullAt(0)) return Vector.empty
    val lo = stats.getLong(0)
    val hi = stats.getLong(1)
    // span via BigInt: ids may legitimately straddle more than half the
    // Long range (e.g. hash-derived ids), where `hi - lo` wraps negative,
    // collapsing microWidth to 1 and blowing the driver histogram up to
    // the distinct-id count instead of the bounded n*64 buckets
    val microWidth = (((BigInt(hi) - BigInt(lo)) / micro) + 1).toLong
    // bucket assignment in double space — immune to Long overflow (and to
    // ANSI arithmetic exceptions) for any (id, lo); double rounding can
    // nudge a value across a micro-bucket edge, which only shifts balance
    // slightly: gap CORRECTNESS depends solely on the explicit bound
    // comparisons below, never on this expression
    val mbExpr = least(greatest(
      ((col("id").cast("double") - lit(lo.toDouble)) / lit(microWidth.toDouble)).cast("long"),
      lit(0L)), lit(micro.toLong - 1L))
    val hist = ids
      .groupBy(mbExpr.as("mb"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val total = hist.map(_._2).sum
    val perBlock = math.max(1L, total / n)
    // greedy merge: cut a block whenever its accumulated count reaches the
    // target; bounds are the first id of each new block (micro-bucket edge)
    val bounds = {
      val b = Vector.newBuilder[Long]
      var acc = 0L
      hist.foreach { case (mb, c) =>
        if (acc >= perBlock) {
          // reconstruct the edge in BigInt (mb*microWidth can exceed Long
          // when the span does) and clamp into [lo, hi]
          b += (BigInt(lo) + BigInt(mb) * microWidth).min(BigInt(hi)).max(BigInt(lo)).toLong
          acc = 0L
        }
        acc += c
      }
      b.result()
    }
    bounds
  }

  /** Block id = number of bounds <= the order column: a pure,
    * deterministic, order-monotonic function. */
  private[operators] def blockIdExpr(bounds: Vector[Long], order: Column): Column =
    if (bounds.isEmpty) lit(0L)
    else bounds.map(b => when(order >= b, 1L).otherwise(0L)).reduce(_ + _)

  /** Missing ranges `(missing_from, missing_to)` of the distinct values of
    * `idCol` (values are assumed unique, e.g. a polling column). */
  def detect(df: DataFrame, idCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ids = df.select(col(idCol).cast("long").as("id"))
    val bounds = equiCountBounds(ids, n)
    val blkExpr = blockIdExpr(bounds, col("id"))

    // pass 2: per-block linear scan -> (kind=0 gaps | kind=1 boundaries)
    // encoded as (kind, a, b, blk): gap=(from,to), boundary=(first,last)
    val scanned = ids.withColumn("blk", blkExpr)
      .repartition(n, col("blk"))
      .sortWithinPartitions("blk", "id")
      .mapPartitions { it =>
        new Iterator[(Int, Long, Long, Long)] {
          private var blk = Long.MinValue
          private var first = 0L
          private var prev = 0L
          private var out: List[(Int, Long, Long, Long)] = Nil
          private def closeBlock(): Unit =
            if (blk != Long.MinValue) out ::= ((1, first, prev, blk))
          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val r = it.next()
              val b = r.getLong(1)
              val v = r.getLong(0)
              if (b != blk) { closeBlock(); blk = b; first = v }
              // sorted & distinct-valued => v >= prev; a gap exists iff the
              // true difference != 1. `v - prev` wraps when the difference
              // exceeds Long.MaxValue, but the wrapped value is then
              // negative — never 1 — so `!= 1` stays exact where `> 1`
              // would silently drop the gap
              else if (v != prev && v - prev != 1) out ::= ((0, prev + 1, v - 1, blk))
              prev = v
            }
            if (out.isEmpty && !it.hasNext && blk != Long.MinValue) {
              closeBlock(); blk = Long.MinValue
            }
          }
          def hasNext: Boolean = { advance(); out.nonEmpty }
          def next(): (Int, Long, Long, Long) = {
            advance(); val h = out.head; out = out.tail; h
          }
        }
      }.toDF("kind", "a", "b", "blk")

    val inBlockGaps = scanned.where(col("kind") === 0)
      .select(col("a").as("missing_from"), col("b").as("missing_to"))

    // pass 3: seams between consecutive non-empty blocks. Boundary set is
    // O(numBlocks) -> one tiny single-partition fold, no window needed.
    val seamGaps = scanned.where(col("kind") === 1)
      .select(col("blk"), col("a").as("first"), col("b").as("last"))
      .repartition(1)
      .sortWithinPartitions("blk")
      .mapPartitions { it =>
        var prevLast = Long.MinValue
        var seen = false
        it.flatMap { r =>
          val first = r.getLong(1)
          val last = r.getLong(2)
          // same wrap-safety as the in-block scan: blocks are disjoint
          // ascending ranges, so first > prevLast and `!= 1` detects any
          // true difference > 1 even past Long overflow
          val gap = if (seen && first - prevLast != 1) Iterator((prevLast + 1, first - 1))
            else Iterator.empty
          seen = true
          prevLast = last
          gap
        }
      }.toDF("missing_from", "missing_to")

    inBlockGaps.union(seamGaps)
  }
}
