package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the batch analog of CDC for sources the
  * reference cannot capture: its polling mode REQUIRES a monotonic
  * column (`CDCSource.java` polling contract) and its listening mode a
  * binlog. A table with neither can still be captured by diffing two
  * point-in-time snapshots: one full-outer join on the primary key,
  * null-safe comparison of the non-key images, and the reference's
  * envelope convention on the way out — `op` in insert/update/delete,
  * after-image columns plain, before-image columns `before_`-prefixed
  * (the flatten convention of `ChangeEnvelope`, ref
  * `CDCSourceUtil.java:75-95`). Inserts carry null `before_` images and
  * deletes null after-images, mirroring the envelope's padding.
  *
  * Scale shape: the ONLY data movement is the two PK hash exchanges of
  * the full-outer join (co-located if both snapshots are bucketed or
  * pre-partitioned on the PK, e.g. written with `bucketBy(pk)`); the
  * image comparison is a map-side null-safe predicate (`<=>`, so a
  * NULL→value transition counts as a change), and unchanged rows — the
  * overwhelming majority between real snapshots — are dropped before
  * anything else happens. No window, no sort, no driver state.
  */
object SnapshotDiff {

  /** Change set `after − before`, keyed by `pk`. Output: pk columns
    * (coalesced, so deletes still carry their key), `_op`
    * (insert/update/delete — [[graft.core.ChangeEnvelope]] constants),
    * the after-image (original names), and the `before_`-prefixed
    * before-image of every non-key column. Unchanged rows are omitted.
    * The column contract matches the flatten convention, so the output
    * feeds [[graft.streaming.JdbcApply]] unchanged — capture by diff,
    * apply by batched statements, a full replication loop for tables
    * with no binlog (round-trip pinned in SnapshotDiffSpec). */
  def diff(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame = {
    val cols = after.columns.toSeq
    require(before.columns.toSeq == cols,
      s"snapshots must share a schema; got ${before.columns.toSeq} vs $cols")
    require(pk.nonEmpty && pk.forall(cols.contains), s"pk $pk must be schema columns")
    val nonPk = cols.filterNot(pk.contains)
    val b = before.select(cols.map(c =>
        if (pk.contains(c)) col(c) else col(c).as(s"before_$c")): _*)
      .withColumn("_in_before", lit(1))
    val a = after.withColumn("_in_after", lit(1))
    val changed = nonPk.map(c => !(col(c) <=> col(s"before_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    a.join(b, pk, "full_outer")
      .withColumn("_op",
        when(col("_in_before").isNull, lit("insert"))
          .when(col("_in_after").isNull, lit("delete"))
          .otherwise(lit("update")))
      .where(col("_in_before").isNull || col("_in_after").isNull || changed)
      .drop("_in_before", "_in_after")
  }
}
