package graft.sources

import java.sql.DriverManager

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Env-gated REAL-VENDOR round-trips for the polling source — the
  * [[graft.streaming.DebeziumRuntime.available]] pattern applied to the
  * dialect paths that every offline run pins only by issued-SQL
  * assertions (PollingSourceSpec): limit/top-N syntax, collation-safe
  * pushdown refusals, range partitioning, delta scans, stream capture.
  *
  * Gate: set `SPARK_GRAFT_MYSQL_URL` / `SPARK_GRAFT_PG_URL` to a JDBC
  * url with embedded credentials (e.g.
  * `jdbc:mysql://host:3306/db?user=u&password=p`) pointing at a
  * database this suite may create and drop `GRAFT_VPOLL` in. Absent →
  * the vendor's cases cancel (the sandbox has no vendor databases; the
  * reference's own default test matrix is H2, with vendors in Docker CI
  * — `TestCaseOfCDCPollingMode.java:79-91`). */
class VendorPollingSpec extends SparkSpec {

  private val vendors = Seq(
    "mysql" -> sys.env.get("SPARK_GRAFT_MYSQL_URL"),
    "postgresql" -> sys.env.get("SPARK_GRAFT_PG_URL"))

  private def roundTrip(vendor: String, url: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE GRAFT_VPOLL") catch { case _: Exception => () }
      st.execute("CREATE TABLE GRAFT_VPOLL (ID INT, NAME VARCHAR(64), V DOUBLE)")
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement("INSERT INTO GRAFT_VPOLL VALUES (?, ?, ?)")
      (1 to 5000).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"n_$i"); ps.setDouble(3, i * 0.5)
        ps.addBatch(); if (i % 1000 == 0) ps.executeBatch()
      }
      ps.executeBatch(); conn.commit(); conn.setAutoCommit(true)

      def load(extra: (String, String)*): DataFrame = {
        val base = spark.read.format("cdc")
          .option("mode", "polling").option("url", url)
          .option("table.name", "GRAFT_VPOLL").option("polling.column", "id")
          .option("statistics.enabled", "false")
        extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
      }
      // range-partitioned snapshot: every row exactly once across partitions
      assert(load("numpartitions" -> "4").count() === 5000L)
      // filter + projection pushdown execute correctly in the vendor's SQL
      import org.apache.spark.sql.functions._
      val filtered = load().where(col("id") > 4900 && col("id") <= 4950)
        .select("id", "v")
      assert(filtered.count() === 50L)
      assert(filtered.agg(sum("id")).head().getLong(0) === (4901L to 4950L).sum)
      // limit pushdown rides the vendor's dialect (LIMIT vs TOP) — the
      // issued-SQL shape is pinned offline; here the semantics must hold
      assert(load().limit(7).collect().length === 7)
      // streaming capture: rows inserted after bootstrap drain through
      // the micro-batch path and the checkpointed offset advances
      val counter = new java.util.concurrent.atomic.AtomicLong()
      val q = spark.readStream.format("cdc")
        .option("mode", "polling").option("url", url)
        .option("table.name", "GRAFT_VPOLL").option("polling.column", "id")
        .option("numpartitions", "2").load()
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"vpoll_$vendor").toString)
        .trigger(Trigger.ProcessingTime(0))
        .foreachBatch { (b: DataFrame, _: Long) => counter.addAndGet(b.count()); () }
        .start()
      try {
        q.processAllAvailable() // bootstrap at MAX(id)
        conn.setAutoCommit(false)
        val ps2 = conn.prepareStatement("INSERT INTO GRAFT_VPOLL VALUES (?, ?, ?)")
        (5001 to 5200).foreach { i =>
          ps2.setInt(1, i); ps2.setString(2, s"n_$i"); ps2.setDouble(3, i * 0.5)
          ps2.addBatch()
        }
        ps2.executeBatch(); conn.commit(); conn.setAutoCommit(true)
        q.processAllAvailable()
        assert(counter.get === 200L)
      } finally q.stop()
      st.execute("DROP TABLE GRAFT_VPOLL")
    } finally conn.close()
  }

  vendors.foreach { case (vendor, urlOpt) =>
    test(s"$vendor polling round-trip (env-gated)") {
      assume(urlOpt.isDefined,
        s"no ${vendor} endpoint configured (SPARK_GRAFT_${vendor.take(2).toUpperCase}..._URL unset) — vendor paths stay pinned by issued-SQL assertions offline")
      roundTrip(vendor, urlOpt.get)
    }
  }
}
