package graft.sources

import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.util.matching.Regex

/** CDC source option parsing + validation — the connector config compiler
  * (reference `util/CDCSourceUtil.java:36-259`) and parameter validation
  * (`CDCSource.java:784-823`, `CDCSourceUtil.java:261-278`) re-expressed
  * as a typed options object for the DataSource V2 `TableProvider`.
  *
  * Reference option names are kept verbatim (`mode`, `url`, `table.name`,
  * `polling.column`, `polling.interval`, `wait.on.missed.record`,
  * `missed.record.waiting.timeout`, `operation`, `connector.properties`).
  */
/** Named connection registry — the Spark-deployable analog of the
  * reference's container-managed pools: Siddhi apps name a connection via
  * `datasource.name` (Carbon datasource service) or `jndi.resource`
  * (container JNDI) instead of inlining url+driver
  * (`CDCSource.java:584-623`, `polling/CDCPoller.java:114-168`). A plain
  * Spark deployment has neither service, so both names resolve against
  * this JVM-local registry (populate it at session bootstrap); an
  * unregistered `jndi.resource` fails with a clear unsupported message
  * rather than attempting a context lookup that cannot succeed here. */
object CdcDataSources {
  final case class Spec(url: String, username: Option[String] = None,
                        password: Option[String] = None)
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Spec]()
  def register(name: String, spec: Spec): Unit = registry.put(name, spec)
  def unregister(name: String): Unit = registry.remove(name)
  def lookup(name: String): Option[Spec] = Option(registry.get(name))
}

final case class CdcOptions(
    mode: String,
    url: String,
    username: Option[String],
    password: Option[String],
    table: String,
    operation: Seq[String],
    pollingColumn: Option[String],
    pollingIntervalSec: Long,
    waitOnMissedRecord: Boolean,
    missedRecordTimeoutSec: Long,
    cronExpression: Option[String],
    numPartitions: Int,
    connectorProperties: Map[String, String],
    scanColumns: Seq[String] = Seq.empty,
    scanWhere: Option[String] = None,
    connectionRetries: Int = 3,
    connectionRetryWaitMs: Long = 1000L,
    pollingHistorySize: Int = 10,
    statisticsEnabled: Boolean = true) {

  def jdbcProperties: java.util.Properties = {
    val p = new java.util.Properties()
    username.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    connectorProperties.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
}

object CdcOptions {
  val ModeListening = "listening"
  val ModePolling = "polling"
  val ValidOps = Set("insert", "update", "delete")

  /** Vendor URL patterns (listening mode), mirroring the reference's
    * per-vendor regexes (`CDCSourceUtil.java:57-204`). */
  val VendorPatterns: Map[String, Regex] = Map(
    "mysql" -> "jdbc:mysql://(\\S+):(\\d+)/(\\S+)".r,
    "postgresql" -> "jdbc:postgresql://(\\S+):(\\d+)/(\\S+)".r,
    "sqlserver" -> "jdbc:sqlserver://(\\S+):(\\d+);databaseName=(\\S+)".r,
    "oracle" -> "jdbc:oracle:thin:@(\\S+):(\\d+):(\\S+)".r,
    "mongodb" -> "mongodb://(\\S+)".r)

  final case class VendorInfo(vendor: String, host: String, port: Int, database: String)

  /** Parse a listening-mode URL into vendor info; unknown vendor → error
    * (`CDCSourceUtil.java:52-55`). */
  def parseUrl(url: String): VendorInfo =
    VendorPatterns.collectFirst {
      case (v, re) if re.pattern.matcher(url).matches() =>
        url match {
          case re(host, port, db) => VendorInfo(v, host, port.toInt, db)
          case re(rest) => VendorInfo(v, rest, -1, "")
        }
    }.getOrElse(throw new IllegalArgumentException(
      s"Unsupported JDBC url for listening mode: $url (supported: ${VendorPatterns.keys.mkString(", ")})"))

  /** `k1=v1,k2=v2` pairs (`CDCSourceUtil.java:261-278`). */
  def parseConnectorProperties(s: String): Map[String, String] =
    if (s.trim.isEmpty) Map.empty
    else s.split(",").map { pair =>
      pair.split("=") match {
        case Array(k, v) => k.trim -> v.trim
        case _ => throw new IllegalArgumentException(
          s"connector.properties entry '$pair' is not a key=value pair")
      }
    }.toMap

  def apply(options: CaseInsensitiveStringMap): CdcOptions = {
    def req(key: String): String = {
      val v = options.get(key)
      require(v != null && v.nonEmpty, s"option '$key' is required")
      v
    }
    val mode = options.getOrDefault("mode", ModeListening).toLowerCase
    require(mode == ModeListening || mode == ModePolling,
      s"unsupported mode '$mode' (listening|polling)")

    // connection resolution precedence mirrors the reference:
    // datasource.name > jndi.resource > url+driver (CDCSource.java:584-623)
    val dsName = Option(options.get("datasource.name")).filter(_.nonEmpty)
    val jndiName = Option(options.get("jndi.resource")).filter(_.nonEmpty)
    if (dsName.nonEmpty || jndiName.nonEmpty)
      require(mode == ModePolling,
        "datasource.name / jndi.resource apply to polling mode only")
    val resolved: Option[CdcDataSources.Spec] = dsName.map { n =>
      CdcDataSources.lookup(n).getOrElse(throw new IllegalArgumentException(
        s"datasource.name '$n' is not registered: call " +
          "CdcDataSources.register(name, Spec(url, ...)) at bootstrap, " +
          "or configure url+driver directly"))
    }.orElse(jndiName.map { n =>
      CdcDataSources.lookup(n).getOrElse(throw new UnsupportedOperationException(
        s"jndi.resource '$n': no JNDI container exists in a plain Spark " +
          "deployment — register the name via CdcDataSources.register, or " +
          "configure url+driver directly"))
    })
    val url = resolved.map(_.url).getOrElse(req("url"))
    val table = req("table.name")
    val cron = Option(options.get("cron.expression")).filter(_.nonEmpty)
    val waitOnMissed = options.getBoolean("wait.on.missed.record", false)
    val opts = new CdcOptions(
      mode = mode,
      url = url,
      username = resolved.flatMap(_.username).orElse(Option(options.get("username"))),
      password = resolved.flatMap(_.password).orElse(Option(options.get("password"))),
      table = table,
      operation = Option(options.get("operation")).map(
        _.split(",").toSeq.map(_.trim.toLowerCase)).getOrElse(Seq.empty),
      pollingColumn = Option(options.get("polling.column")),
      pollingIntervalSec = options.getLong("polling.interval", 1L),
      waitOnMissedRecord = waitOnMissed,
      missedRecordTimeoutSec = options.getLong("missed.record.waiting.timeout", -1L),
      cronExpression = cron,
      numPartitions = options.getInt("numpartitions", 4),
      connectorProperties = parseConnectorProperties(
        options.getOrDefault("connector.properties", "")),
      scanColumns = Option(options.get("scan.columns")).map(
        _.split(",").toSeq.map(_.trim.toLowerCase).filter(_.nonEmpty)).getOrElse(Seq.empty),
      scanWhere = Option(options.get("scan.where")).map(_.trim).filter(_.nonEmpty),
      connectionRetries = options.getInt("connection.retries", 3),
      connectionRetryWaitMs = options.getLong("connection.retry.wait.ms", 1000L),
      // metrics poll-ring depth (CDCSource.java:627-630, default 10) —
      // consumed by CdcMetrics.Listener(opts.pollingHistorySize)
      pollingHistorySize = options.getInt("polling.history.size", 10),
      // size-estimation probe (SELECT COUNT(*) at plan time) — on vendors
      // where COUNT(*) walks the table (Postgres MVCC, Derby) the probe
      // taxes every planned scan over a large fact table; disable to trade
      // auto-broadcast of small snapshots for zero planning-time DB load
      statisticsEnabled = options.getBoolean("statistics.enabled", true))
    validate(opts)
    opts
  }

  /** Mirrors `CDCSource.java:784-823` rules. */
  def validate(o: CdcOptions): Unit = o.mode match {
    case ModeListening =>
      require(o.operation.nonEmpty, "listening mode requires 'operation'")
      require(o.operation.forall(ValidOps.contains),
        s"unsupported operation(s) ${o.operation.filterNot(ValidOps.contains).mkString(",")}")
      require(o.cronExpression.isEmpty, "cron.expression is not allowed in listening mode")
      parseUrl(o.url) // vendor whitelist check
    case ModePolling =>
      require(o.pollingColumn.nonEmpty, "polling mode requires 'polling.column'")
      require(o.pollingIntervalSec >= 0, "polling.interval must be >= 0")
      require(!(o.waitOnMissedRecord && o.cronExpression.nonEmpty),
        "cron.expression cannot be used with wait.on.missed.record")
      o.cronExpression.foreach(c => require(isValidCron(c),
        s"invalid cron.expression '$c' (expected Quartz-style 'sec min hour dom month dow [year]')"))
      // scan.columns narrows the streaming SELECT list at the source
      // (Catalyst's V2 pushdown rules do not run for streaming scans, so
      // the source must be told — the reference solves the same problem
      // with user-overridable select templates, PollingStrategy.java:127-205);
      // the polling column must stay in the list: offsets and range
      // predicates are typed off the inferred schema
      if (o.scanColumns.nonEmpty)
        require(o.pollingColumn.forall(p => o.scanColumns.contains(p.toLowerCase)),
          s"scan.columns must include the polling column '${o.pollingColumn.get}'")
      require(o.pollingHistorySize > 0,
        s"polling.history.size must be positive, got ${o.pollingHistorySize}")
  }

  private val CronMonths = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val CronDays = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")
  // (min, max) per field: sec, min, hour, day-of-month, month, day-of-week, year
  private val CronFieldRanges =
    Seq((0, 59), (0, 59), (0, 23), (1, 31), (1, 12), (1, 7), (1970, 2199))

  /** Quartz-style cron validation (reference `CDCSource.java:569-576` via
    * Quartz `CronExpression.isValidExpression`): 6-7 whitespace-separated
    * fields `sec min hour dom month dow [year]`; each field a comma list
    * of `*`, `?` (dom/dow), `L`/`L-n`/`LW`/`nW` (dom), `n#w`/`nL` (dow),
    * values, ranges, and `/step` suffixes, with per-field numeric domains
    * and JAN-DEC / SUN-SAT names. A structural validator, not a scheduler: it rejects
    * malformed expressions (the reference's bad-cron negative test) and
    * accepts everything Quartz runs in the reference's own tests. */
  def isValidCron(expr: String): Boolean = {
    def toNum(tok: String, idx: Int): Option[Int] = {
      val t = idx match {
        case 4 if CronMonths.contains(tok.toUpperCase) => (CronMonths.indexOf(tok.toUpperCase) + 1).toString
        case 5 if CronDays.contains(tok.toUpperCase) => (CronDays.indexOf(tok.toUpperCase) + 1).toString
        case _ => tok
      }
      scala.util.Try(t.toInt).toOption
    }
    def inRange(v: Int, idx: Int): Boolean =
      v >= CronFieldRanges(idx)._1 && v <= CronFieldRanges(idx)._2
    def okBase(base: String, idx: Int): Boolean = base match {
      case "*" => true
      case "?" => idx == 3 || idx == 5
      case "L" => idx == 3 || idx == 5
      // Quartz dom extensions: "LW" (last weekday), "L-n" (n days before
      // the last day, offset 1-30) — must precede the generic range case,
      // which would misparse "L-3" as the range L..3
      case b if idx == 3 && b.toUpperCase == "LW" => true
      case b if idx == 3 && b.toUpperCase.startsWith("L-") =>
        scala.util.Try(b.drop(2).toInt).toOption.exists(n => n >= 1 && n <= 30)
      // Quartz dow extension: "nL" (last <weekday> of the month)
      case b if idx == 5 && b.toUpperCase.endsWith("L") =>
        toNum(b.dropRight(1), idx).exists(inRange(_, idx))
      case b if b.contains("-") => b.split("-", -1) match {
        case Array(x, y) => toNum(x, idx).exists(inRange(_, idx)) && toNum(y, idx).exists(inRange(_, idx))
        case _ => false
      }
      case b if idx == 5 && b.contains("#") => b.split("#", -1) match {
        case Array(x, y) => toNum(x, idx).exists(inRange(_, idx)) &&
          scala.util.Try(y.toInt).toOption.exists(n => n >= 1 && n <= 5)
        case _ => false
      }
      case b if idx == 3 && b.toUpperCase.endsWith("W") =>
        toNum(b.dropRight(1), idx).exists(inRange(_, idx))
      case b => toNum(b, idx).exists(inRange(_, idx))
    }
    def okItem(item: String, idx: Int): Boolean = item.split("/", -1) match {
      case Array(base) => okBase(base, idx)
      case Array(base, step) =>
        okBase(base, idx) && scala.util.Try(step.toInt).toOption.exists(_ > 0)
      case _ => false
    }
    val fields = expr.trim.split("\\s+")
    fields.length >= 6 && fields.length <= 7 &&
      fields.zipWithIndex.forall { case (f, i) =>
        f.nonEmpty && f.split(",", -1).forall(item => item.nonEmpty && okItem(item, i))
      } &&
      // Quartz's one structural rule beyond per-field grammar: dom and dow
      // cannot BOTH be specified — one must be '?' ("Support for specifying
      // both a day-of-week AND a day-of-month parameter is not
      // implemented"). "0 0 12 * * *" — the common crontab habit — must
      // fail fast here like the reference does via isValidExpression.
      (fields(3) == "?" || fields(5) == "?")
  }
}
