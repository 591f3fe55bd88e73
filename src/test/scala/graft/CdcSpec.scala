package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The single-entry facade: reference-style options in, flattened change
  * stream out, for every mode/transport combination. */
class CdcSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  test("listening mode + envelope replay: options map -> flattened stream") {
    val dir = Files.createTempDirectory("cdc_facade").toString
    Files.write(java.nio.file.Paths.get(dir, "e.json"),
      ("""{"op":"c","before":null,"after":{"id":"1","name":"a"},"source":{"ts_ms":1},"ts_ms":2}""" + "\n" +
       """{"op":"d","before":{"id":"1","name":"a"},"after":null,"source":{"ts_ms":3},"ts_ms":4}""")
        .getBytes("UTF-8"))
    // replay needs NO connection details (no fabricated jdbc url), and
    // option keys are case-insensitive like everywhere else in Spark
    val s = Cdc.stream(spark, Map(
      "Mode" -> "listening", "Operation" -> "insert,delete",
      "Envelope.Replay.Dir" -> dir),
      rowSchema = Some(rowSchema))
    assert(s.handle.isEmpty)
    val q = s.df.writeStream.format("memory").queryName("cdc_facade")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT _op, id, before_id FROM cdc_facade ORDER BY _ts_ms")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(("insert", "1", ""), ("delete", "", "1")))
  }

  test("listening without a schema or transport fails with actionable messages") {
    val base = Map("mode" -> "listening", "url" -> "jdbc:mysql://h:3306/db",
      "username" -> "u", "password" -> "p", "table.name" -> "t", "operation" -> "insert")
    val e1 = intercept[IllegalArgumentException](Cdc.stream(spark, base))
    assert(e1.getMessage.contains("rowSchema"))
    // no replay dir: routes to the live engine path, which the test
    // classpath satisfies via the stub (so a missing stateDir is the error)
    val e2 = intercept[IllegalArgumentException](
      Cdc.stream(spark, base, rowSchema = Some(rowSchema)))
    assert(e2.getMessage.contains("stateDir"))
  }

  test("e2e: CDC change stream feeds CEP pattern detection (the reference's use case)") {
    // the reference's whole purpose: a Siddhi pattern query consuming the
    // CDC stream (`from every a=cdcStream -> b=... within T`). Here:
    // churn detection — an insert followed by a delete of the same user
    // within 10 s, straight off the flattened change stream.
    import org.apache.spark.sql.functions._
    val userSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("name", StringType)))
    val dir = Files.createTempDirectory("cdc_cep").toString
    def env(op: String, before: String, after: String, ts: Long): String =
      s"""{"op":"$op","before":$before,"after":$after,"source":{"ts_ms":$ts},"ts_ms":$ts}"""
    Files.write(java.nio.file.Paths.get(dir, "e.json"), Seq(
      env("c", "null", """{"user_id":1,"name":"a"}""", 1000L),
      env("c", "null", """{"user_id":2,"name":"b"}""", 2000L),
      env("d", """{"user_id":1,"name":"a"}""", "null", 5000L),  // churn: 4 s
      env("c", "null", """{"user_id":3,"name":"c"}""", 3000L),
      env("d", """{"user_id":3,"name":"c"}""", "null", 60_000L), // too late: 57 s
      // watermark sentinels
      env("c", "null", """{"user_id":99,"name":"z"}""", 200_000L),
      env("c", "null", """{"user_id":99,"name":"z"}""", 300_000L),
    ).mkString("\n").getBytes("UTF-8"))

    val s = Cdc.stream(spark, Map(
      "mode" -> "listening", "operation" -> "insert,delete",
      "envelope.replay.dir" -> dir), rowSchema = Some(userSchema))
    val events = s.df
      // delete rows carry the key in the before image (multi-op padding
      // fills the absent after image with defaults, not nulls)
      .withColumn("uid", when(col("_op") === "delete", col("before_user_id"))
        .otherwise(col("user_id")))
      .withColumn("ts", timestamp_millis(col("_ts_ms")))
    val churn = graft.streaming.StreamPatterns.followedBy(
      events, "uid", "ts", "_ts_ms", "_op", "insert", "delete",
      withinUs = 10_000_000L, delay = "0 seconds")
    val q = churn.toDF().writeStream.format("memory").queryName("cdc_churn")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT key, gap FROM cdc_churn WHERE key != 99")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 4_000_000L))) // only user 1 churned within 10 s
  }

  test("e2e: CDC change stream feeds the count-quantifier pattern (updates<2:> -> delete)") {
    // "a delete preceded by 2+ updates within 10 s" straight off the
    // flattened change stream — Siddhi count quantifier on CDC events
    import org.apache.spark.sql.functions._
    val userSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("name", StringType)))
    val dir = Files.createTempDirectory("cdc_cseq").toString
    def env(op: String, before: String, after: String, ts: Long): String =
      s"""{"op":"$op","before":$before,"after":$after,"source":{"ts_ms":$ts},"ts_ms":$ts}"""
    def u(id: Long) = s"""{"user_id":$id,"name":"x"}"""
    Files.write(java.nio.file.Paths.get(dir, "e.json"), Seq(
      env("u", u(1), u(1), 1000L), env("u", u(1), u(1), 2000L),
      env("d", u(1), "null", 5000L),                     // 2 updates in window -> match
      env("u", u(2), u(2), 1000L),
      env("d", u(2), "null", 4000L),                     // only 1 update -> no match
      env("u", u(3), u(3), 1000L), env("u", u(3), u(3), 40_000L),
      env("d", u(3), "null", 45_000L),                   // first update aged out -> no match
      env("u", u(99), u(99), 200_000L), env("u", u(99), u(99), 300_000L),
    ).mkString("\n").getBytes("UTF-8"))

    val s = Cdc.stream(spark, Map(
      "mode" -> "listening", "operation" -> "update,delete",
      "envelope.replay.dir" -> dir), rowSchema = Some(userSchema))
    val events = s.df
      .withColumn("uid", when(col("_op") === "delete", col("before_user_id"))
        .otherwise(col("user_id")))
      .withColumn("ts", timestamp_millis(col("_ts_ms")))
    val hits = graft.streaming.StreamPatterns.countSequence(
      events, "uid", "ts", "_ts_ms", "_op", "update", "delete",
      withinUs = 10_000_000L, minCount = 2L, delay = "0 seconds")
    val q = hits.toDF().writeStream.format("memory").queryName("cdc_cseq")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT key, a_cnt FROM cdc_cseq WHERE key != 99")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("snapshot-diff capture loop: bootstrap sync, quiet round, crash replay (no-binlog O17/O18 analog)") {
    // the capture-mode mirror of the polling checkpoint-recovery spec:
    // state lives under stateDir instead of a stream checkpoint, commit
    // happens AFTER apply (at-least-once, same geometry as foreachBatch)
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:/tmp/graft-derby/cap_loop;create=true"
    val plain = url.stripSuffix(";create=true")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      for (t <- Seq("CSRC", "CTGT")) {
        try conn.createStatement().execute(s"DROP TABLE $t") catch { case _: Exception => }
        conn.createStatement().execute(s"CREATE TABLE $t (ID INT, NAME VARCHAR(32), V DOUBLE)")
      }
      conn.createStatement().execute(
        "INSERT INTO CSRC VALUES (1,'a',1.0), (2,'b',2.0), (3,'c',3.0)")
      val opts = Map("url" -> plain, "table.name" -> "CSRC",
        "polling.column" -> "id", "numpartitions" -> "2")
      val state = Files.createTempDirectory("cap_state").toString
      val spec = graft.sources.Jdbc.ConnectionSpec(plain, Map.empty)
      def src() = query("CSRC"); def tgt() = query("CTGT")
      def query(t: String) = {
        val rs = conn.createStatement().executeQuery(s"SELECT ID, NAME, V FROM $t ORDER BY ID")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
      }
      // round 0: bootstrap — the initial full sync arrives as inserts
      assert(Cdc.snapshotDiffApply(spark, opts, Seq("id"), state, spec, "CTGT") === 3L)
      assert(tgt() === src())
      // quiet round: two digest tables compared, zero changes applied
      assert(Cdc.snapshotDiffApply(spark, opts, Seq("id"), state, spec, "CTGT") === 0L)
      // mutations while the loop was "down" — including the in-place
      // update and delete the reference's polling deltas can never see
      conn.createStatement().execute("UPDATE CSRC SET V = 9.0 WHERE ID = 2")
      conn.createStatement().execute("DELETE FROM CSRC WHERE ID = 3")
      conn.createStatement().execute("INSERT INTO CSRC VALUES (4,'d',4.0)")
      // crash BEFORE apply: a capture that derives its change set and
      // dies — never applied, never committed
      val crashed = Cdc.snapshotCapture(spark, opts, Seq("id"), state)
      val lost = crashed.changes.select("id", "_op").orderBy("id")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(lost === Seq((2, "update"), (3, "delete"), (4, "insert")))
      // restart: the orphaned round is swept, the SAME change set is
      // recomputed from the last committed baseline, applied, committed
      assert(Cdc.snapshotDiffApply(spark, opts, Seq("id"), state, spec, "CTGT") === 3L)
      assert(tgt() === src())
      // crash AFTER apply, before commit: the round replays and
      // re-applies — at-least-once, and row-level ops converge
      conn.createStatement().execute("UPDATE CSRC SET NAME = 'B2' WHERE ID = 2")
      val applied = Cdc.snapshotCapture(spark, opts, Seq("id"), state)
      graft.streaming.JdbcApply(spec, "CTGT", Seq("id"))(applied.changes, applied.round)
      assert(tgt() === src()) // applied... then "crash" (no commit)
      assert(Cdc.snapshotDiffApply(spark, opts, Seq("id"), state, spec, "CTGT") === 1L)
      assert(tgt() === src()) // replayed update is idempotent
      // and the loop is settled: nothing left to deliver
      assert(Cdc.snapshotDiffApply(spark, opts, Seq("id"), state, spec, "CTGT") === 0L)
    } finally conn.close()
  }

  test("polling mode routes to the V2 source with options intact") {
    // no DB behind it — assert routing by the source's own failure mode:
    // the error must come from the JDBC layer hitting OUR url (proving
    // the options reached the V2 source), not from a listening-path guard
    val e = intercept[Exception](Cdc.stream(spark, Map(
      "mode" -> "polling", "url" -> "jdbc:derby:/nonexistent/cdc_facade_missing",
      "table.name" -> "t", "polling.column" -> "id")).df.schema)
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    val msgs = chain(e).mkString(" | ")
    assert(msgs.contains("cdc_facade_missing") || msgs.toLowerCase.contains("derby"),
      s"failure did not come from the JDBC path: $msgs")
  }
}
