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
