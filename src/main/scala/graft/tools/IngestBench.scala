package graft.tools

import java.sql.DriverManager

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Polling-source ingest throughput: N rows through the V2 source
  * (Derby → micro-batch → count), reported as rows/s. The reference's
  * polling path is a single-threaded JDBC scan dispatching events
  * row-at-a-time through Siddhi; ours splits the range across executor
  * threads ('numPartitions'). */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val parts = if (args.length > 1) args(1) else "8"
    System.setProperty("derby.system.home", "/tmp/graft-derby-bench")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val dbUrl = s"jdbc:derby:/tmp/graft-derby-bench/ingest_${System.nanoTime()};create=true"
    val conn = DriverManager.getConnection(dbUrl)
    conn.createStatement().execute(
      "CREATE TABLE EVENTS (ID INT, NAME VARCHAR(64), V DOUBLE)")
    conn.setAutoCommit(false)
    val ps = conn.prepareStatement("INSERT INTO EVENTS VALUES (?, ?, ?)")
    (1 to n).foreach { i =>
      ps.setInt(1, i); ps.setString(2, s"payload_$i"); ps.setDouble(3, i * 0.5)
      ps.addBatch()
      if (i % 10000 == 0) ps.executeBatch()
    }
    ps.executeBatch(); conn.commit(); conn.setAutoCommit(true)

    val spark = GraftSession.create("32")
    // offset -1 fixture: read from a checkpoint-free AvailableNow run over
    // a pre-seeded table requires an initial offset below the data; use a
    // second empty-bootstrap trick: bootstrap on empty table, then insert.
    // Simpler: batch-mode snapshot measures the same executor read path.
    var seen = 0L
    val t0 = System.nanoTime()
    val df = spark.read.format("cdc")
      .option("mode", "polling").option("url", dbUrl.stripSuffix(";create=true"))
      .option("table.name", "EVENTS").option("polling.column", "id")
      .option("numpartitions", parts).load()
    seen = df.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[ingest] snapshot read: $seen rows in $dt%.2f s = ${seen / dt}%.0f rows/s")

    // streaming path: new table, stream established first, then bulk insert
    conn.createStatement().execute(
      "CREATE TABLE EVENTS2 (ID INT, NAME VARCHAR(64), V DOUBLE)")
    val sdf = spark.readStream.format("cdc")
      .option("mode", "polling").option("url", dbUrl.stripSuffix(";create=true"))
      .option("table.name", "EVENTS2").option("polling.column", "id")
      .option("numpartitions", parts).load()
    val counter = new java.util.concurrent.atomic.AtomicLong()
    val q = sdf.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingest_ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: DataFrame, _: Long) => counter.addAndGet(b.count()); () }
      .start()
    q.processAllAvailable() // bootstrap offset on empty table
    conn.setAutoCommit(false)
    val ps2 = conn.prepareStatement("INSERT INTO EVENTS2 VALUES (?, ?, ?)")
    (1 to n).foreach { i =>
      ps2.setInt(1, i); ps2.setString(2, s"payload_$i"); ps2.setDouble(3, i * 0.5)
      ps2.addBatch()
      if (i % 10000 == 0) ps2.executeBatch()
    }
    ps2.executeBatch(); conn.commit()
    val t1 = System.nanoTime()
    q.processAllAvailable()
    val dt2 = (System.nanoTime() - t1) / 1e9
    q.stop()
    println(f"[ingest] stream drain: ${counter.get} rows in $dt2%.2f s = ${counter.get / dt2}%.0f rows/s")
    spark.stop()
    conn.close()
  }
}
