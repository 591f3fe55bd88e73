package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics over integer-valued columns — the corpus-
  * profiling step of a training-data pipeline (token-length percentiles
  * per language drive filtering thresholds and batch/context budgeting).
  *
  * Quantiles are computed by the VALUE-HISTOGRAM formulation, not a
  * per-row sort: aggregate (group, value) cells first (map-side partial
  * aggregation does the heavy counting inside the scan stage), then run
  * the cumulative window over the HISTOGRAM, whose size is
  * |groups| × |distinct values| — independent of row count. At 100 TB
  * the shuffle moves only histogram cells (a token-count histogram is a
  * few thousand cells per language), where `percentile`/sort-based exact
  * quantiles would shuffle every row to a per-group sort, and
  * `percentile_approx` would trade exactness for it. Low group
  * cardinality (languages) is fine BECAUSE the per-group work is
  * histogram-sized; rows never concentrate on the group key.
  *
  * Exact discrete quantile contract (`q = num/den`): the k-th smallest
  * value with k = ceil(q·n) — pure integer arithmetic
  * (`cum·den >= num·n`), so any SQL engine reproduces it bit-for-bit
  * (no interpolation / float divergence).
  */
object Distribution {

  /** Per-group exact discrete quantiles + count + sum of `valueCol`.
    * `quantiles` = (outputAlias, num, den) with 0 < num/den <= 1.
    * Output: (group, n_rows, total, <one column per quantile alias>).
    */
  def groupedDiscreteQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                               quantiles: Seq[(String, Int, Int)]): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(groupCol).orderBy(valueCol)
    val wAll = Window.partitionBy(groupCol)
    val cells = hist
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
      .withColumn("_tot", sum(col(valueCol) * col("_c")).over(wAll))
    val qCols: Seq[Column] = quantiles.map { case (alias, num, den) =>
      require(num > 0 && den > 0 && num <= den, s"quantile $alias out of (0,1]")
      // cum >= ceil(num*n/den)  <=>  cum*den >= num*n  (integer-exact)
      min(when(col("_cum") * den >= col("_n") * num, col(valueCol))).as(alias)
    }
    val aggs = Seq(max(col("_n")).as("n_rows"), max(col("_tot")).as("total")) ++ qCols
    cells.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
