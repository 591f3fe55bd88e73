package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Negative-validation matrix mirroring the reference's
  * TestCaseOfCDCSourceValidation.java:57-457 (8 cases). */
class CdcOptionsSpec extends AnyFunSuite {

  private def opts(kv: (String, String)*): CdcOptions =
    CdcOptions(new CaseInsensitiveStringMap(kv.toMap.asJava))

  private val baseListening = Seq(
    "url" -> "jdbc:mysql://localhost:3306/db", "username" -> "u",
    "password" -> "p", "table.name" -> "login", "operation" -> "insert")

  test("valid listening options parse; vendor URL decomposed") {
    val o = opts(baseListening: _*)
    assert(o.mode === "listening" && o.operation === Seq("insert"))
    val v = CdcOptions.parseUrl(o.url)
    assert(v.vendor === "mysql" && v.host === "localhost" && v.port === 3306 && v.database === "db")
  }

  test("comma operation list parses and validates") {
    val o = opts(baseListening :+ ("operation" -> "insert, UPDATE ,delete"): _*)
    assert(o.operation === Seq("insert", "update", "delete"))
  }

  test("invalid operation rejected") {
    val e = intercept[IllegalArgumentException](
      opts(baseListening :+ ("operation" -> "upsert"): _*))
    assert(e.getMessage.contains("operation"))
  }

  test("unsupported mode rejected") {
    intercept[IllegalArgumentException](opts(baseListening :+ ("mode" -> "streaming"): _*))
  }

  test("missing url / table.name rejected") {
    intercept[IllegalArgumentException](opts("table.name" -> "t", "operation" -> "insert"))
    intercept[IllegalArgumentException](opts("url" -> "jdbc:mysql://h:1/d", "operation" -> "insert"))
  }

  test("missing operation in listening mode rejected") {
    intercept[IllegalArgumentException](opts(
      "url" -> "jdbc:mysql://localhost:3306/db", "table.name" -> "login"))
  }

  test("unsupported vendor URL rejected in listening mode") {
    intercept[IllegalArgumentException](opts(baseListening :+ ("url" -> "jdbc:h2:mem:db"): _*))
  }

  test("cron.expression rejected in listening mode") {
    intercept[IllegalArgumentException](opts(baseListening :+ ("cron.expression" -> "*/5 * * * * ?"): _*))
  }

  test("polling mode requires polling.column; any JDBC vendor allowed") {
    val o = opts("mode" -> "polling", "url" -> "jdbc:derby:/tmp/x",
      "table.name" -> "t", "polling.column" -> "id")
    assert(o.pollingColumn === Some("id"))
    intercept[IllegalArgumentException](opts(
      "mode" -> "polling", "url" -> "jdbc:derby:/tmp/x", "table.name" -> "t"))
  }

  test("cron + wait.on.missed.record mutually exclusive (polling)") {
    intercept[IllegalArgumentException](opts(
      "mode" -> "polling", "url" -> "jdbc:derby:/tmp/x", "table.name" -> "t",
      "polling.column" -> "id", "wait.on.missed.record" -> "true",
      "cron.expression" -> "*/5 * * * * ?"))
  }

  test("connector.properties k=v pairs parse; malformed rejected") {
    assert(CdcOptions.parseConnectorProperties("a=1, b = 2") === Map("a" -> "1", "b" -> "2"))
    intercept[IllegalArgumentException](CdcOptions.parseConnectorProperties("a=1,b"))
  }

  test("postgres / sqlserver / oracle / mongo URLs decompose") {
    assert(CdcOptions.parseUrl("jdbc:postgresql://h:5432/d").vendor === "postgresql")
    assert(CdcOptions.parseUrl("jdbc:sqlserver://h:1433;databaseName=d").vendor === "sqlserver")
    assert(CdcOptions.parseUrl("jdbc:oracle:thin:@h:1521:orcl").vendor === "oracle")
    assert(CdcOptions.parseUrl("mongodb://h:27017/d").vendor === "mongodb")
  }
}
