package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.DriverManager

import graft.SparkSpec
import graft.core.ChangeEnvelope
import graft.sources.Jdbc
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Listening-mode round-trips via envelope replay — the Spark analog of
  * TestCaseOfCDCListeningMode (insert :72-144, delete :150-241,
  * update :247-334) plus the downstream table-apply queries and O20
  * metrics. */
class ListeningModeSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  /** Derby lacks IF EXISTS: drop leftovers from prior runs quietly. */
  private def recreateTable(conn: java.sql.Connection, ddl: String, table: String): Unit = {
    try conn.createStatement().execute(s"DROP TABLE $table") catch { case _: Exception => () }
    conn.createStatement().execute(ddl)
  }

  private def writeEnvelopes(dir: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, s"batch_${System.nanoTime()}.json"),
      lines.mkString("\n"))
  }

  private def env(op: String, before: String, after: String, ts: Long = 200L): String = {
    val b = if (before == null) "null" else before
    val a = if (after == null) "null" else after
    s"""{"op":"$op","before":$b,"after":$a,"source":{"ts_ms":100},"ts_ms":$ts}"""
  }

  private def runToMemory(dir: String, operation: String, sink: String): Unit = {
    val flat = EnvelopeStream.flatten(
      EnvelopeStream.replay(spark, dir, rowSchema), rowSchema, operation)
    val q = flat.writeStream.format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("insert round-trip: after-image payload equality (ref :136-139)") {
    val dir = Files.createTempDirectory("env_ins").toString
    writeEnvelopes(dir, Seq(
      env("c", null, """{"id":"e001","name":"empName"}"""),
      env("u", """{"id":"e001","name":"empName"}""", """{"id":"e001","name":"newName"}"""),
      env("r", null, """{"id":"e999","name":"snap"}""")))
    runToMemory(dir, "insert", "ins_sink")
    val rows = spark.sql("SELECT id, name, _op FROM ins_sink").collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "e001" && rows.head.getString(1) === "empName")
    assert(rows.head.getString(2) === "insert")
  }

  test("delete round-trip: before_ payload (ref :233-236)") {
    val dir = Files.createTempDirectory("env_del").toString
    writeEnvelopes(dir, Seq(
      env("d", """{"id":"e001","name":"empName"}""", null),
      env("c", null, """{"id":"e002","name":"x"}""")))
    runToMemory(dir, "delete", "del_sink")
    val rows = spark.sql("SELECT before_id, before_name FROM del_sink").collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "e001" && rows.head.getString(1) === "empName")
  }

  test("update round-trip: [before_id, id, before_name, name] (ref :328-329)") {
    val dir = Files.createTempDirectory("env_upd").toString
    writeEnvelopes(dir, Seq(
      env("u", """{"id":"e001","name":"empName"}""", """{"id":"e001","name":"newName"}""")))
    runToMemory(dir, "update", "upd_sink")
    val df = spark.table("upd_sink")
    assert(df.columns.take(4).toSeq === Seq("before_id", "id", "before_name", "name"))
    val r = df.collect().head
    assert(Seq(r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ===
      Seq("e001", "e001", "empName", "newName"))
  }

  test("change application sink: insert/update/delete land in the JDBC table") {
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:/tmp/graft-derby/db_apply;create=true"
    val conn = DriverManager.getConnection(url)
    recreateTable(conn, "CREATE TABLE LOGIN (ID VARCHAR(16), NAME VARCHAR(32))", "LOGIN")
    try {
      val dir = Files.createTempDirectory("env_apply").toString
      writeEnvelopes(dir, Seq(
        env("c", null, """{"id":"e001","name":"empName"}""", ts = 1),
        env("c", null, """{"id":"e002","name":"other"}""", ts = 2),
        env("u", """{"id":"e001","name":"empName"}""", """{"id":"e001","name":"newName"}""", ts = 3),
        env("d", """{"id":"e002","name":"other"}""", null, ts = 4)))
      val flat = EnvelopeStream.flatten(
        EnvelopeStream.replay(spark, dir, rowSchema), rowSchema, "insert,update,delete")
      val spec = Jdbc.ConnectionSpec("jdbc:derby:/tmp/graft-derby/db_apply", Map.empty)
      val q = flat // handler itself key-partitions + orders by _ts_ms
        .writeStream.foreachBatch(JdbcApply(spec, "LOGIN", Seq("id")))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rs = conn.createStatement().executeQuery("SELECT ID, NAME FROM LOGIN ORDER BY ID")
      val got = Iterator.continually(rs).takeWhile(_.next()).map(r => (r.getString(1), r.getString(2))).toList
      assert(got === List(("e001", "newName"))) // e002 deleted, e001 updated
    } finally conn.close()
  }

  test("change application preserves stream order: delete then re-insert same key") {
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:/tmp/graft-derby/db_order;create=true"
    val conn = DriverManager.getConnection(url)
    recreateTable(conn, "CREATE TABLE LOGINO (ID VARCHAR(16), NAME VARCHAR(32))", "LOGINO")
    try {
      val dir = Files.createTempDirectory("env_order").toString
      writeEnvelopes(dir, Seq(
        env("c", null, """{"id":"k1","name":"v1"}""", ts = 1),
        env("d", """{"id":"k1","name":"v1"}""", null, ts = 2),
        env("c", null, """{"id":"k1","name":"v2"}""", ts = 3))) // re-created after delete
      val flat = EnvelopeStream.flatten(
        EnvelopeStream.replay(spark, dir, rowSchema), rowSchema, "insert,update,delete")
      val spec = Jdbc.ConnectionSpec("jdbc:derby:/tmp/graft-derby/db_order", Map.empty)
      // NO coalesce(1): the handler must key-partition and _ts_ms-order the
      // multi-partition batch itself (delete at ts=2 must precede the ts=3
      // re-insert even when they arrive in different source partitions)
      val q = flat.repartition(4)
        .writeStream.foreachBatch(JdbcApply(spec, "LOGINO", Seq("id")))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rs = conn.createStatement().executeQuery("SELECT ID, NAME FROM LOGINO")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), r.getString(2))).toList
      // per-op batching would run the DELETE after both INSERTs -> empty table
      assert(got === List(("k1", "v2")))
    } finally conn.close()
  }

  test("CdcPoll.trigger honors polling.interval and cron") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Map("mode" -> "polling", "url" -> "jdbc:derby:/tmp/x",
      "table.name" -> "t", "polling.column" -> "id")
    assert(CdcPoll.trigger(base + ("polling.interval" -> "60")) ===
      Trigger.ProcessingTime(60000))
    assert(CdcPoll.trigger(base) === Trigger.ProcessingTime(1000)) // reference default 1 s
    assert(CdcPoll.trigger(base + ("cron.expression" -> "0 0 * * * ?")) ===
      Trigger.AvailableNow())
  }

  test("O20 metrics: per-op counters + IDLE status via observe/listener") {
    val dir = Files.createTempDirectory("env_metrics").toString
    writeEnvelopes(dir, Seq(
      env("c", null, """{"id":"1","name":"a"}"""),
      env("c", null, """{"id":"2","name":"b"}"""),
      env("u", """{"id":"1","name":"a"}""", """{"id":"1","name":"a2"}"""),
      env("d", """{"id":"2","name":"b"}""", null)))
    val listener = new CdcMetrics.Listener
    spark.streams.addListener(listener)
    try {
      val flat = CdcMetrics.observed(EnvelopeStream.flatten(
        EnvelopeStream.replay(spark, dir, rowSchema), rowSchema, "insert,update,delete"))
      val q = flat.writeStream.format("noop").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // listener events are async
      org.scalatest.concurrent.Eventually.eventually(
        org.scalatest.concurrent.Eventually.timeout(org.scalatest.time.Span(10, org.scalatest.time.Seconds))) {
        assert(listener.totalReads.get === 4)
      }
      assert(listener.inserts.get === 2)
      assert(listener.updates.get === 1)
      assert(listener.deletes.get === 1)
      assert(listener.errors.get === 0)
      // poll-history ring (reference default size 10): batches recorded.
      // Inside eventually: record() runs after the counter updates, so the
      // ring can lag totalReads by a beat on the listener thread.
      org.scalatest.concurrent.Eventually.eventually(
        org.scalatest.concurrent.Eventually.timeout(org.scalatest.time.Span(10, org.scalatest.time.Seconds))) {
        val hist = listener.pollHistory
        assert(hist.nonEmpty && hist.size <= CdcMetrics.DefaultHistorySize)
        assert(hist.map(_.events).sum === 4)
      }
      // db_status gauge (ref PollingMetrics.java:119-130): ordinal of the
      // current status once a batch has arrived; CONSUMING=0/IDLE=1/ERROR=2
      assert(listener.eventsInLastBatch.get > 0)
      assert(Set(0, 1).contains(listener.dbStatusOrdinal)) // consuming or already idle
      assert(listener.idleTimeSec >= 0)
    } finally spark.streams.removeListener(listener)
  }

  test("O20 metrics: listener ring sized from polling.history.size") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import scala.jdk.CollectionConverters._
    val opts = graft.sources.CdcOptions(new CaseInsensitiveStringMap(Map(
      "mode" -> "polling", "url" -> "jdbc:derby:/tmp/x", "table.name" -> "t",
      "polling.column" -> "id", "polling.history.size" -> "3").asJava))
    assert(CdcMetrics.listener(opts).historySize === 3)
    assert(new CdcMetrics.Listener().historySize === CdcMetrics.DefaultHistorySize)
  }

  test("O20 metrics: db_status is -1 before any batch; status ordinals match the reference") {
    val fresh = new CdcMetrics.Listener
    assert(fresh.dbStatusOrdinal === -1)
    assert(fresh.idleTimeSec === 0)
    assert(CdcMetrics.Consuming.ordinal === 0)
    assert(CdcMetrics.Idle.ordinal === 1)
    assert(CdcMetrics.ErrorStatus.ordinal === 2)
    assert(CdcMetrics.Success.ordinal === 3)
  }

  test("O20 metrics: shortened JDBC URL for metric names (MetricsUtils parity)") {
    import CdcMetrics.shortenedJdbcUrl
    // short URLs pass through
    assert(shortenedJdbcUrl("jdbc:mysql://h:3306/db") === "jdbc:mysql://h:3306/db")
    // mysql/postgres: property tail after ? is dropped with `..`
    assert(shortenedJdbcUrl("jdbc:mysql://h:3306/db?useSSL=false") ===
      "jdbc:mysql://h:3306/db..")
    // sqlserver/derby: tail after ; dropped
    assert(shortenedJdbcUrl("jdbc:sqlserver://h:1433;databaseName=db") ===
      "jdbc:sqlserver://h:1433..")
    // >30 chars: cut at 30 extended through the identifier run
    val long = "jdbc:postgresql://averyveryverylonghostname.example.com:5432/db"
    val s = shortenedJdbcUrl(long)
    assert(s.endsWith("..") && s.length < long.length)
    assert(CdcMetrics.databaseUrlKey("h:3306", "login") === "h:3306/login")
  }
}
