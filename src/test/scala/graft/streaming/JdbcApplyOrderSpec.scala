package graft.streaming

import java.sql.DriverManager

import graft.SparkSpec
import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** JdbcApply ordering and mode edge cases (advice r2):
  *   - same-millisecond same-key operations across many source partitions
  *     apply in SOURCE-OFFSET order when `orderCols` names the offset;
  *   - delete-only flattened streams (before_* + metadata columns only)
  *     apply without referencing absent after-image columns. */
class JdbcApplyOrderSpec extends SparkSpec {
  import spark.implicits._

  private def withTable(db: String, ddl: String, table: String)(f: (String, java.sql.Connection) => Unit): Unit = {
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = s"jdbc:derby:/tmp/graft-derby/$db;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute(s"DROP TABLE $table") catch { case _: Exception => }
      conn.createStatement().execute(ddl)
      f(s"jdbc:derby:/tmp/graft-derby/$db", conn)
    } finally conn.close()
  }

  test("equal-_ts_ms same-key ops across >=4 partitions apply in offset order") {
    withTable("db_ord2", "CREATE TABLE T_ORD (ID VARCHAR(8), V VARCHAR(8), OFF BIGINT)", "T_ORD") { (url, conn) =>
      // 5 ops on one key, ALL at _ts_ms=5, arriving scattered over 8
      // partitions: only the offset column (a data column, as a polling
      // column is) recovers stream order. Final state after off=5 must be
      // the re-inserted v4 row.
      val batch = Seq(
        ("k1", "v1", 1L, "k1", "v1", "insert", 5L),
        ("k1", "v2", 2L, "k1", "v1", "update", 5L),
        ("k1", "v3", 3L, "k1", "v2", "update", 5L),
        ("k1", "v3", 4L, "k1", "v3", "delete", 5L),
        ("k1", "v4", 5L, "k1", "v3", "insert", 5L))
        .toDF("id", "v", "off", "before_id", "before_v", "_op", "_ts_ms")
        .repartition(8) // scrambles partition-major _seq vs offset order
      JdbcApply(Jdbc.ConnectionSpec(url, Map.empty), "T_ORD", Seq("id"),
        orderCols = Seq("off"))(batch, 0L)
      val rs = conn.createStatement().executeQuery("SELECT ID, V FROM T_ORD")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), r.getString(2))).toList
      assert(got === List(("k1", "v4")))
    }
  }

  test("delete-only stream (no after-image columns) applies by before_ keys") {
    withTable("db_delonly", "CREATE TABLE T_DEL (ID VARCHAR(8), V VARCHAR(8))", "T_DEL") { (url, conn) =>
      Seq("a" -> "1", "b" -> "2", "c" -> "3").foreach { case (k, v) =>
        conn.createStatement().execute(s"INSERT INTO T_DEL VALUES ('$k', '$v')")
      }
      // flatten(..., "delete") emits ONLY before_* + metadata columns
      val batch = Seq(("a", "1", "delete", 1L), ("c", "3", "delete", 2L))
        .toDF("before_id", "before_v", "_op", "_ts_ms")
        .repartition(4)
      JdbcApply(Jdbc.ConnectionSpec(url, Map.empty), "T_DEL", Seq("id"))(batch, 0L)
      val rs = conn.createStatement().executeQuery("SELECT ID FROM T_DEL")
      val got = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toList
      assert(got === List("b"))
    }
  }
}
