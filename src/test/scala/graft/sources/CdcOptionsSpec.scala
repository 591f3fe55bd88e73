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

  test("connection precedence: datasource.name > jndi.resource > url (ref CDCSource.java:584-623)") {
    CdcDataSources.register("ds1", CdcDataSources.Spec(
      "jdbc:derby:/tmp/ds1", Some("dsuser"), Some("dspass")))
    CdcDataSources.register("jndi/cdc", CdcDataSources.Spec("jdbc:derby:/tmp/jndi1"))
    try {
      // datasource.name wins over an inline url AND over jndi.resource
      val viaDs = opts("mode" -> "polling", "table.name" -> "t",
        "polling.column" -> "id", "datasource.name" -> "ds1",
        "jndi.resource" -> "jndi/cdc", "url" -> "jdbc:derby:/tmp/inline",
        "username" -> "inlineuser")
      assert(viaDs.url === "jdbc:derby:/tmp/ds1")
      assert(viaDs.username === Some("dsuser") && viaDs.password === Some("dspass"))
      // jndi.resource is next when no datasource.name
      val viaJndi = opts("mode" -> "polling", "table.name" -> "t",
        "polling.column" -> "id", "jndi.resource" -> "jndi/cdc")
      assert(viaJndi.url === "jdbc:derby:/tmp/jndi1")
      // registered spec without credentials falls back to inline ones
      val cred = opts("mode" -> "polling", "table.name" -> "t",
        "polling.column" -> "id", "jndi.resource" -> "jndi/cdc",
        "username" -> "u2")
      assert(cred.username === Some("u2"))
      // unregistered names fail with actionable messages
      val noDs = intercept[IllegalArgumentException](opts(
        "mode" -> "polling", "table.name" -> "t", "polling.column" -> "id",
        "datasource.name" -> "nope"))
      assert(noDs.getMessage.contains("not registered"))
      val noJndi = intercept[UnsupportedOperationException](opts(
        "mode" -> "polling", "table.name" -> "t", "polling.column" -> "id",
        "jndi.resource" -> "nope"))
      assert(noJndi.getMessage.contains("no JNDI container"))
      // polling-mode-only options
      intercept[IllegalArgumentException](opts(
        "mode" -> "listening", "url" -> "jdbc:mysql://h:3306/d",
        "table.name" -> "t", "operation" -> "insert",
        "datasource.name" -> "ds1"))
    } finally {
      CdcDataSources.unregister("ds1")
      CdcDataSources.unregister("jndi/cdc")
    }
  }

  test("polling.history.size parses with the reference default; non-positive rejected") {
    val base = Seq("mode" -> "polling", "url" -> "jdbc:derby:/tmp/x",
      "table.name" -> "t", "polling.column" -> "id")
    assert(opts(base: _*).pollingHistorySize === 10)
    assert(opts(base :+ ("polling.history.size" -> "25"): _*).pollingHistorySize === 25)
    intercept[IllegalArgumentException](opts(base :+ ("polling.history.size" -> "0"): _*))
  }

  test("cron + wait.on.missed.record mutually exclusive (polling)") {
    intercept[IllegalArgumentException](opts(
      "mode" -> "polling", "url" -> "jdbc:derby:/tmp/x", "table.name" -> "t",
      "polling.column" -> "id", "wait.on.missed.record" -> "true",
      "cron.expression" -> "*/5 * * * * ?"))
  }

  test("malformed cron.expression rejected; Quartz forms accepted (O16, ref CDCSource.java:569-576)") {
    def polling(cron: String) = opts(
      "mode" -> "polling", "url" -> "jdbc:derby:/tmp/x", "table.name" -> "t",
      "polling.column" -> "id", "cron.expression" -> cron)
    // accepted: the forms the reference's own tests schedule with Quartz
    Seq("*/5 * * * * ?", "0 0 12 * * ?", "0 15 10 ? * MON-FRI",
        "0 0/5 14 * * ?", "0 15 10 ? * 6#3", "0 15 10 L * ?",
        "0 15 10 15W * ?", "0 0 12 * JAN,JUN ? 2099",
        // Quartz last-day forms: L-n offset, LW last weekday, nL last-dow
        "0 15 10 L-3 * ?", "0 15 10 LW * ?", "0 15 10 ? * 6L")
      .foreach(c => assert(polling(c).cronExpression === Some(c), c))
    // rejected: structurally invalid expressions fail fast at validate,
    // including the crontab habit of specifying BOTH dom and dow (Quartz
    // requires one to be '?' — isValidExpression rejects "0 0 12 * * *")
    Seq("not a cron", "* * *", "99 * * * * ?", "0 0 25 * * ?",
        "0 0 12 * 13 ?", "0 0 12 ? * 8", "0 0 12 * * ? 1900",
        "a b c d e f", "0 0 12 * * ? ? ?", "0 -1 12 * * ?", "0 0/0 12 * * ?",
        "0 0 12 * * *", "*/5 * * * * *", "0 15 10 1 * MON",
        "0 15 10 L-0 * ?", "0 15 10 L-31 * ?", "0 15 10 ? * 8L")
      .foreach(c => assert(intercept[IllegalArgumentException](polling(c))
        .getMessage.contains("cron"), c))
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
