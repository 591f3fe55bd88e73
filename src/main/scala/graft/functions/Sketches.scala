package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus monitoring at 100 TB.
  *
  * A training-data pipeline constantly asks "how many distinct X per Y"
  * (distinct tokens per source, distinct users per event type, vocabulary
  * growth per crawl) — and at corpus scale an exact `count(distinct …)`
  * per group re-shuffles the full value set every time it is asked. The
  * KMV (k-minimum-values) bottom-k sketch answers the same question from
  * k hashes per group: keep the k smallest values of a uniform hash of
  * the group's distinct values; with `h_k` the k-th smallest over a hash
  * domain `M`, the unbiased estimate of the distinct count is
  * `(k-1) * M / h_k` (Bar-Yossef et al., RANDOM 2002; Beyer et al.,
  * SIGMOD 2007). Sketches MERGE: the bottom-k of a union is the bottom-k
  * of the concatenated per-part sketches, so partial sketches roll up
  * across files, days, or crawls without revisiting the data —
  * the property that makes the estimator usable as a maintained artifact
  * (the [[graft.operators.IncrementalAgg]] posture for cardinalities).
  *
  * Deterministic by construction: the hash is the repo's Rabin–Karp
  * rolling hash spread by the [[TextFunctions.SampleMix]] odd-constant
  * multiply (a bijection on [0, RollHashMod), so the spread cannot
  * create collisions), which means Spark, the DuckDB oracle, and any
  * merge of partial sketches produce bit-identical minima and estimates.
  */
object Sketches {

  /** Default sketch size. Standard error of the KMV estimator is
    * ~1/sqrt(k-2) ≈ 13% at k=64 — monitoring-grade; callers needing
    * tighter bounds raise k (cost is linear in k per group). */
  val DefaultK = 64

  private val M = TextFunctions.RollHashMod

  /** The sketch hash: rolling hash of the value string, spread across
    * the domain by the SampleMix bijection (raw rolling hashes of short
    * strings cluster near 0, which would bias `h_k` low and the
    * estimate high). */
  def sketchHash(value: Column): Column =
    TextFunctions.rollingHash(value) * TextFunctions.SampleMix % M

  /** (group, n_min_hashes, kth_hash) → the 4-column sketch report.
    * Integral `div` (not `/`, which is double true-division in Spark) so
    * the estimate is the same BIGINT arithmetic the DuckDB oracle's `//`
    * performs. */
  private def estimate(k: Int): Column =
    when(col("n_min_hashes") < k, col("n_min_hashes"))
      .otherwise(expr(s"(${(k - 1)}L * ${M}L) div greatest(kth_hash, 1L)"))
      .cast("long").as("est_distinct")

  /** Bottom-k distinct sketch per group over `value` (a string column).
    *
    * Output: (`groupCol`, n_min_hashes, kth_hash, est_distinct), one row
    * per group. `n_min_hashes` ≤ k is the number of retained minima —
    * when it is < k the group's distinct count fit entirely in the
    * sketch and `est_distinct` is exact (collision probability over the
    * 1e9 domain aside); otherwise `est_distinct = (k-1)*M div kth_hash`.
    *
    * Scale shape: the only corpus-sized exchange is the distinct on
    * (group, hash) — map-side partial distinct, then one shuffle of the
    * distinct pairs. The bottom-k itself is the salted two-phase top-k
    * (the [[Similarity]] centroid-outlier pattern): pass 1 ranks within
    * (group, hash mod salts) — `salts`× the parallelism of a per-group
    * sort, and exact, because the k global minima are always among the k
    * minima of their own salt lane — so pass 2 sorts ≤ salts·k rows per
    * group, never the group's distinct set. */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column,
                  k: Int = DefaultK, salts: Int = 8): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k): the estimator divides by k-1")
    require(salts >= 1, s"salts must be >= 1 (got $salts)")
    val glob = Window.partitionBy(col("_g")).orderBy(col("_h"))
    kmvPartial(df, groupCol, value, k, salts)
      .withColumn("_rn", row_number().over(glob))
      .groupBy(col("_g"))
      .agg(max(col("_rn")).cast("long").as("n_min_hashes"),
        max(col("_h")).as("kth_hash"))
      .select(col("_g").as(groupCol), col("n_min_hashes"), col("kth_hash"),
        estimate(k))
  }

  /** Merge partial sketches: (_g, _h) minima rows from any number of
    * [[kmvPartial]] parts → the same output as [[kmvDistinct]] over the
    * union (renamed back to `groupCol`). One row per retained hash in;
    * dedup across parts happens here. */
  def kmvMerge(parts: DataFrame, groupCol: String, k: Int = DefaultK): DataFrame = {
    val glob = Window.partitionBy(col("_g")).orderBy(col("_h"))
    kmvCompact(parts, k)
      .withColumn("_rn", row_number().over(glob))
      .groupBy(col("_g"))
      .agg(max(col("_rn")).cast("long").as("n_min_hashes"),
        max(col("_h")).as("kth_hash"))
      .select(col("_g").as(groupCol), col("n_min_hashes"), col("kth_hash"),
        estimate(k))
  }

  /** The per-group retained-minima rows ([[kmvMerge]] input shape):
    * (`groupCol` as _g, _h). Exposed so partial sketches can be
    * persisted per part and merged later without the source data. */
  def kmvPartial(df: DataFrame, groupCol: String, value: Column,
                 k: Int = DefaultK, salts: Int = 8): DataFrame = {
    val d = df.select(col(groupCol).as("_g"), sketchHash(value).as("_h")).distinct()
    val lane = Window.partitionBy(col("_g"), pmod(col("_h"), lit(salts.toLong)))
      .orderBy(col("_h"))
    val pruned = d.withColumn("_rn", row_number().over(lane))
      .where(col("_rn") <= k).drop("_rn")
    val glob = Window.partitionBy(col("_g")).orderBy(col("_h"))
    pruned.withColumn("_rn", row_number().over(glob)).where(col("_rn") <= k)
      .select(col("_g"), col("_h"))
  }

  /** Minima-ROW-preserving merge of [[kmvPartial]] parts: the bottom-k
    * of the concatenated parts, still in the (_g, _h) partial shape —
    * closed under itself, so a STORED partial sketch folds with each
    * increment's without unbounded growth (bottom-k of a union is the
    * bottom-k of the union of bottom-ks). [[kmvMerge]] is the
    * report-producing terminal form of the same computation. */
  def kmvCompact(parts: DataFrame, k: Int = DefaultK): DataFrame = {
    val glob = Window.partitionBy(col("_g")).orderBy(col("_h"))
    parts.select(col("_g"), col("_h")).distinct()
      .withColumn("_rn", row_number().over(glob)).where(col("_rn") <= k)
      .select(col("_g"), col("_h"))
  }

  // ---- Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) ----

  /** Default depth/width: 4 × 1024 cells. Error bound: with probability
    * 1 − (1/2)^depth the over-count of any estimate is ≤ 2·N/width
    * (N = stream length) — the point-query guarantee of the CM sketch.
    * Raising `width` tightens the bound linearly; the cell table stays a
    * broadcastable constant (depth·width rows) either way. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Per-row bucket mixers (multiplier, offset): the xxHash32 public
    * prime constants and Knuth's LCG increment. Each row's bucket is
    * `((h·a + b) mod M) mod width`; `h < M ≈ 1e9` and `a ≤ 3.27e9` keep
    * the product within Long, and the whole chain is plain BIGINT
    * arithmetic the DuckDB oracle reproduces bit-identically. */
  val CmsMixers: Vector[(Long, Long)] = Vector(
    (2246822519L, 0L), (3266489917L, 1013904223L),
    (668265263L, 2027808446L), (374761393L, 3041712669L))

  /** Bucket of spread hash `h` in sketch row `j`. */
  def cmsBucket(h: Column, j: Int, width: Int = CmsWidth): Column = {
    val (a, b) = CmsMixers(j)
    (h * a + b) % M % width
  }

  /** Build the cell table (_j, _b, _cnt) for one part of a value stream.
    * The explode is map-side and feeds a partial aggregation in the same
    * stage, so the only exchange is the depth·width cell grid — the
    * sketch costs O(cells) network no matter how large the part is.
    * Cells MERGE by addition ([[cmsMerge]]), so per-file/per-day partial
    * sketches roll up without revisiting the data — the same maintained-
    * artifact posture as [[kmvPartial]]. */
  def cmsPartial(df: DataFrame, value: Column, depth: Int = CmsDepth,
                 width: Int = CmsWidth): DataFrame = {
    require(depth >= 1 && depth <= CmsMixers.size,
      s"depth must be in [1, ${CmsMixers.size}] (got $depth)")
    require(width >= 2, s"width must be >= 2 (got $width)")
    df.select(sketchHash(value).as("_h"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("_j"), cmsBucket(col("_h"), j, width).as("_b"))): _*))
        .as("_jb"))
      .groupBy(col("_jb._j").as("_j"), col("_jb._b").as("_b"))
      .agg(count(lit(1)).as("_cnt"))
  }

  /** Merge partial cell tables: cell-wise sum. */
  def cmsMerge(parts: DataFrame): DataFrame =
    parts.groupBy(col("_j"), col("_b")).agg(sum(col("_cnt")).as("_cnt"))

  /** Point-query the sketch: for each distinct item in `items`, the
    * CM estimate `min_j cells[j][bucket_j(item)]` (≥ the true count,
    * never under). The cell table is depth·width rows — a constant — so
    * the join is a hard broadcast by construction, and the probe side
    * aggregates map-side on the item. Items absent from the sketch's
    * stream estimate as ≥ 0 via the coalesce (a foreign probe can hit
    * empty cells). */
  def cmsEstimate(items: DataFrame, itemCol: String, cells: DataFrame,
                  depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    require(depth >= 1 && depth <= CmsMixers.size,
      s"depth must be in [1, ${CmsMixers.size}] (got $depth)")
    items.select(col(itemCol), sketchHash(col(itemCol)).as("_h"))
      .select(col(itemCol), explode(array((0 until depth).map(j =>
        struct(lit(j).as("_j"), cmsBucket(col("_h"), j, width).as("_b"))): _*))
        .as("_jb"))
      .select(col(itemCol), col("_jb._j").as("_j"), col("_jb._b").as("_b"))
      .join(broadcast(cells), Seq("_j", "_b"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("_cnt"), lit(0L))).cast("long").as("est_cnt"))
  }

  /** Heavy hitters over a value stream: every distinct value whose CM
    * estimate reaches `supportPermille`‰ of the stream length. Because
    * the estimate never under-counts, recall is 1.0 by construction
    * (every true heavy hitter survives); precision is bounded by the CM
    * over-count. The stream is read twice (cells + candidates), both
    * passes map-side-combined; at maintenance scale the cell table is
    * the persisted artifact and only [[cmsEstimate]] probes re-run. */
  def heavyHitters(df: DataFrame, value: Column, supportPermille: Int,
                   depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    require(supportPermille >= 1 && supportPermille <= 1000,
      s"supportPermille must be in [1, 1000] (got $supportPermille)")
    val vals = df.select(value.as("_v"))
    val cells = cmsPartial(vals, col("_v"), depth, width)
    val total = vals.groupBy().agg(count(lit(1)).as("_n"))
    cmsEstimate(vals.distinct(), "_v", cells, depth, width)
      .crossJoin(broadcast(total))
      .where(col("est_cnt") * 1000 >= col("_n") * supportPermille)
      .select(col("_v").as("token"), col("est_cnt"))
  }
}
