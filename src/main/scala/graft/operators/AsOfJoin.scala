package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — attach to each left row the most recent right-side
  * state at-or-before its timestamp (inclusive), per key. The reference's
  * downstream surface joins change streams to CURRENT table state
  * (SURVEY §2.1 sink queries, `TestCaseOfCDCListeningMode.java:179-181,
  * 275-277`); the as-of variant joins to the state *as of event time* —
  * the slowly-changing-dimension read every CDC consumer eventually
  * needs, and one Spark has no built-in operator for.
  *
  * Formulation: union both sides, one hash exchange on `key`,
  * per-partition sort by (ts, side), running `last(state, ignoreNulls)`
  * window, keep left rows. Exactly one shuffle of (left + right) rows —
  * the cost profile of a sort-merge join. The naive theta-join
  * (`l.key = r.key AND l.ts >= r.ts` + max-per-row) plans a
  * per-key-cross-product and collapses at scale; this shape is the
  * standard distributed as-of (same idea as Flink's temporal join).
  *
  * Right-side state travels inside ONE struct so a NULL field value
  * survives: per-column `last(c, ignoreNulls)` would skip a genuine null
  * back to an older version of the dimension.
  *
  * Precondition: `right` is unique per (key, ts) — dedupe upstream (e.g.
  * keep the greatest tiebreak via row_number, see q17); with duplicates
  * the winner among equal timestamps is not deterministic (DuckDB's
  * native ASOF JOIN has the same contract).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "as-of join needs at least one state column")
    val clash = stateCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"state columns collide with left columns: $clash")
    val leftCols = left.columns.toSeq

    val stateType = right.select(struct(stateCols.map(col): _*).as("s"))
      .schema("s").dataType
    val leftType = left.select(struct(leftCols.map(col): _*).as("l"))
      .schema("l").dataType

    val l = left.select(col(key).as("_asof_key"), col(ts).as("_asof_ts"),
      lit(0).as("_asof_side"),
      lit(null).cast(stateType).as("_asof_state"),
      struct(leftCols.map(col): _*).as("_asof_left"))
    val r = right.select(col(key).as("_asof_key"), col(ts).as("_asof_ts"),
      lit(1).as("_asof_side"),
      struct(stateCols.map(col): _*).as("_asof_state"),
      lit(null).cast(leftType).as("_asof_left"))

    // side DESC puts the right row first on timestamp ties -> inclusive
    // (left at ts T sees right state stamped exactly T)
    val w = Window.partitionBy(col("_asof_key"))
      .orderBy(col("_asof_ts").asc, col("_asof_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_asof_filled", last(col("_asof_state"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 0)
      .select(leftCols.map(c => col(s"_asof_left.$c").as(c)) ++
        stateCols.map(c => col(s"_asof_filled.$c").as(c)): _*)
  }
}
