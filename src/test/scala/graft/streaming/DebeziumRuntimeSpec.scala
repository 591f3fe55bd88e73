package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CdcOptions
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** O1 full listening mode through the REFLECTIVE engine path: the test
  * classpath carries a stub of Debezium's public embedded-engine API, so
  * DebeziumRuntime discovers it exactly as it would the real jars, builds
  * the engine through the Builder interface, spools envelope JSON, and
  * the spool feeds the standard replay → flatten pipeline. */
class DebeziumRuntimeSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  private def opts(kv: (String, String)*): CdcOptions =
    CdcOptions(new CaseInsensitiveStringMap(kv.toMap.asJava))

  private val listening = opts(
    "url" -> "jdbc:mysql://dbhost:3306/shop", "username" -> "u",
    "password" -> "p", "table.name" -> "login", "operation" -> "insert",
    "connector.properties" -> "snapshot.mode=initial")

  test("availability is discovered from the classpath") {
    assert(DebeziumRuntime.available)
  }

  test("engineProps compiles the reference connector config (O2 for the engine)") {
    val p = DebeziumRuntime.engineProps(listening, "/tmp/graft-dbz-state")
    assert(p.getProperty("connector.class") === "io.debezium.connector.mysql.MySqlConnector")
    assert(p.getProperty("name") === "dbhost_3306")
    assert(p.getProperty("database.hostname") === "dbhost")
    assert(p.getProperty("database.port") === "3306")
    assert(p.getProperty("table.include.list") === "shop.login")
    val sid = p.getProperty("database.server.id").toInt
    assert(sid >= 5400 && sid <= 6400)
    assert(p.getProperty("offset.storage.file.filename")
      === "/tmp/graft-dbz-state/offsets.dat")
    // connector.properties overrides merge last
    assert(p.getProperty("snapshot.mode") === "initial")
    // deterministic: same config -> same server id (restart stability)
    assert(DebeziumRuntime.engineProps(listening, "/x").getProperty("database.server.id")
      === sid.toString)
  }

  test("listen: engine events spool and flatten into the typed change stream") {
    val stateDir = Files.createTempDirectory("dbz_state").toString
    io.debezium.engine.StubEngine.EVENTS.clear()
    io.debezium.engine.StubEngine.EVENTS.addAll(java.util.List.of(
      """{"op":"c","before":null,"after":{"id":"e001","name":"empName"},"source":{"ts_ms":100},"ts_ms":200}""",
      """{"op":"u","before":{"id":"e001","name":"empName"},"after":{"id":"e001","name":"newName"},"source":{"ts_ms":101},"ts_ms":201}""",
      """{"op":"d","before":{"id":"e001","name":"newName"},"after":null,"source":{"ts_ms":102},"ts_ms":202}"""))
    val (envelopes, handle) = EnvelopeStream.listen(spark, listening, rowSchema, stateDir)
    try {
      // engine runs on its own thread; wait for the spool flush (500ms linger)
      val deadline = System.currentTimeMillis() + 10000
      while (Files.list(java.nio.file.Paths.get(s"$stateDir/spool")).count() == 0 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val flat = EnvelopeStream.flatten(envelopes, rowSchema, "insert,update,delete")
      val q = flat.writeStream.format("memory").queryName("dbz_live")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.sql("SELECT _op, id, name, before_name FROM dbz_live ORDER BY _ts_ms")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      // multi-op flatten pads absent images with type defaults (O7)
      assert(got.toSeq === Seq(
        ("insert", "e001", "empName", ""),
        ("update", "e001", "newName", "empName"),
        ("delete", "", "", "newName")))
    } finally handle.close()
  }

  test("engineProps compiles a mongo connector config (not the RDBMS shape)") {
    val mongo = opts("url" -> "mongodb://mhost:27017/shop", "username" -> "u",
      "password" -> "p", "table.name" -> "login", "operation" -> "insert")
    val p = DebeziumRuntime.engineProps(mongo, "/tmp/s")
    assert(p.getProperty("connector.class") === "io.debezium.connector.mongodb.MongoDbConnector")
    assert(p.getProperty("mongodb.connection.string") === "mongodb://mhost:27017/shop")
    assert(p.getProperty("name") === "mhost_27017")
    assert(p.getProperty("database.include.list") === "shop")
    assert(p.getProperty("collection.include.list") === "shop.login")
    assert(p.getProperty("database.hostname") === null) // no RDBMS leakage
    // a database-less mongo url fails fast at config time, not in the engine
    val bad = opts("url" -> "mongodb://mhost:27017", "username" -> "u",
      "password" -> "p", "table.name" -> "login", "operation" -> "insert")
    val e = intercept[IllegalArgumentException] {
      DebeziumRuntime.engineProps(bad, "/tmp/s")
    }
    assert(e.getMessage.contains("database"))
  }

  test("spool resumes file numbering after restart (no overwrite of processed files)") {
    val dir = Files.createTempDirectory("dbz_spool").toString
    val s1 = new DebeziumRuntime.Spool(dir)
    s1.append("""{"a":1}""")
    s1.close()
    // a restarted engine must not re-use part-00000000.json: the recovered
    // file-stream query tracks names and would silently skip the new data
    val s2 = new DebeziumRuntime.Spool(dir)
    s2.append("""{"a":2}""")
    s2.close()
    val names = Files.list(java.nio.file.Paths.get(dir)).iterator()
    val files = scala.collection.mutable.ArrayBuffer[String]()
    while (names.hasNext) files += names.next().getFileName.toString
    assert(files.sorted === Seq("part-00000000.json", "part-00000001.json"))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000000.json"))).trim === """{"a":1}""")
  }

  test("engine properties reach the engine through the reflective builder") {
    assert(io.debezium.engine.StubEngine.LAST_PROPS != null)
    assert(io.debezium.engine.StubEngine.LAST_PROPS.getProperty("connector.class")
      === "io.debezium.connector.mysql.MySqlConnector")
  }
}
