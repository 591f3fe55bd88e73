package graft.streaming

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core.ChangeEnvelope
import graft.sources.Jdbc

/** Downstream change application — the reference's sink surface
  * (`from stream insert into table`, `delete t on t.k==k`,
  * `update t on t.k==k`; `TestCaseOfCDCListeningMode.java:179-181,275-277`,
  * `TestCaseOfCDCPollingMode.java:129-131`) as a `foreachBatch` handler.
  *
  * Input: a multi-op flattened change stream (after-image columns,
  * `before_*` columns, `_op` metadata — [[ChangeEnvelope.flatten]]).
  * Per batch, per partition: batched prepared statements (executor-
  * parallel writes; the driver never sees the rows). Inserts append the
  * after image; updates set after-image non-keys matching on after-image
  * keys; deletes match on BEFORE-image keys (the reference's delete
  * carries only the before image).
  */
object JdbcApply {

  /** foreachBatch handler: `df.writeStream.foreachBatch(JdbcApply(spec, "login", Seq("id")))`.
    *
    * Ordering at parallelism > 1: the reference applies events
    * single-threaded, but `foreachPartition` runs partitions concurrently —
    * so the batch is first hash-repartitioned on the EFFECTIVE key (the
    * before-image key for deletes, the after-image key otherwise: in
    * multi-op mode a delete's after columns are default-padded and would
    * hash to the wrong partition) and sorted within each partition by
    * `orderCol` (+ original batch position as tiebreak). All operations on
    * one key land in one partition in stream order; different keys apply
    * concurrently, which is safe because row-level ops on distinct keys
    * commute. */
  def apply(spec: Jdbc.ConnectionSpec, table: String, keyCols: Seq[String],
            orderCol: String = "_ts_ms")
  : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val cols = batch.columns.filter(c => !c.startsWith("_") && !c.startsWith(ChangeEnvelope.BeforePrefix))
    val nonKeys = cols.filterNot(keyCols.contains)
    val hasBefore = keyCols.forall(k => batch.columns.contains(ChangeEnvelope.BeforePrefix + k))
    val effKeys = keyCols.map { k =>
      if (hasBefore)
        when(col("_op") === ChangeEnvelope.Delete, col(ChangeEnvelope.BeforePrefix + k))
          .otherwise(col(k)).as(s"_gk_$k")
      else col(k).as(s"_gk_$k")
    }
    val ordered = batch
      .withColumn("_seq", monotonically_increasing_id())
      .select(batch.columns.map(col) :+ col("_seq") :+ struct(effKeys: _*).as("_gk"): _*)
      .repartition(col("_gk"))
      .sortWithinPartitions(col(orderCol), col("_seq"))
    ordered.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = Jdbc.connect(spec)
        try applyPartition(conn, table, keyCols.toSeq, nonKeys.toSeq, cols.toSeq, rows)
        finally conn.close()
      }
    }
  }

  /** Rows apply in STREAM ORDER: consecutive same-op rows batch into one
    * executeBatch, and the batch flushes whenever the op changes — so a
    * delete(k) followed by insert(k) re-creation lands in that order
    * (per-op regrouping would silently corrupt such interleavings).
    * Statements are prepared lazily: an all-key table has no valid UPDATE
    * statement, which must not break insert/delete-only batches. */
  private def applyPartition(conn: Connection, table: String, keys: Seq[String],
                             nonKeys: Seq[String], cols: Seq[String], rows: Iterator[Row]): Unit = {
    lazy val ins = conn.prepareStatement(
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})")
    lazy val upd = {
      require(nonKeys.nonEmpty,
        s"cannot apply updates to $table: every column is a key")
      conn.prepareStatement(s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")}")
    }
    lazy val del = conn.prepareStatement(
      s"DELETE FROM $table WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")}")

    var pending: PreparedStatement = null
    var pendingN = 0
    def flush(): Unit = if (pendingN > 0) { pending.executeBatch(); pendingN = 0 }
    def enqueue(ps: PreparedStatement): Unit = {
      if (!(ps eq pending)) { flush(); pending = ps }
      ps.addBatch(); pendingN += 1
    }
    rows.foreach { r =>
      r.getAs[String]("_op") match {
        case ChangeEnvelope.Insert =>
          cols.zipWithIndex.foreach { case (c, i) => ins.setObject(i + 1, r.getAs[Any](c)) }
          enqueue(ins)
        case ChangeEnvelope.Update =>
          nonKeys.zipWithIndex.foreach { case (c, i) => upd.setObject(i + 1, r.getAs[Any](c)) }
          keys.zipWithIndex.foreach { case (c, i) => upd.setObject(nonKeys.size + i + 1, r.getAs[Any](c)) }
          enqueue(upd)
        case ChangeEnvelope.Delete =>
          keys.zipWithIndex.foreach { case (c, i) =>
            del.setObject(i + 1, r.getAs[Any](ChangeEnvelope.BeforePrefix + c))
          }
          enqueue(del)
        case _ => // snapshot reads dropped upstream
      }
    }
    flush()
  }
}
