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

  /** foreachBatch handler: `df.writeStream.foreachBatch(JdbcApply(spec, "login", Seq("id")))`. */
  def apply(spec: Jdbc.ConnectionSpec, table: String, keyCols: Seq[String])
  : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val cols = batch.columns.filter(c => !c.startsWith("_") && !c.startsWith(ChangeEnvelope.BeforePrefix))
    val nonKeys = cols.filterNot(keyCols.contains)
    batch.foreachPartition { rows: Iterator[Row] =>
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
