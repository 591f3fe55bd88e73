package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Properties
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import graft.sources.CdcOptions

/** In-process Debezium log-tail (reference O1,
  * `listening/ChangeDataCapture.java:83-99`), loaded REFLECTIVELY: the
  * offline build ships no Debezium jars, so the engine is discovered at
  * runtime (`Class.forName`) and driven through its public interfaces.
  * When the jars are absent, [[available]] is false and callers fall back
  * to envelope replay ([[EnvelopeStream.replay]]) — the decode/flatten/
  * offset pipeline is identical either way.
  *
  * Architecture: the engine's consumer thread appends envelope JSON to a
  * spool directory (atomic tmp+rename per file, so Spark's file stream
  * source never sees partial files); [[EnvelopeStream.listen]] reads the
  * spool as a streaming DataFrame. This keeps the engine OFF the query
  * execution path — exactly the reference's dedicated single-thread
  * executor (`CDCSource.java:663-671`) — and gives the stream the usual
  * checkpoint/recovery semantics for free.
  */
object DebeziumRuntime {

  /** True when Debezium Embedded is on the runtime classpath. */
  def available: Boolean =
    try { Class.forName("io.debezium.engine.DebeziumEngine"); true }
    catch { case _: ClassNotFoundException => false }

  /** Debezium connector class per vendor
    * (reference `util/CDCSourceUtil.java:57-204`). */
  val ConnectorClasses: Map[String, String] = Map(
    "mysql" -> "io.debezium.connector.mysql.MySqlConnector",
    "postgresql" -> "io.debezium.connector.postgresql.PostgresConnector",
    "sqlserver" -> "io.debezium.connector.sqlserver.SqlServerConnector",
    "oracle" -> "io.debezium.connector.oracle.OracleConnector",
    "mongodb" -> "io.debezium.connector.mongodb.MongoDbConnector")

  /** Compile CdcOptions into an embedded-engine config (reference
    * `util/CDCSourceUtil.java:36-259`): vendor → connector class, server
    * name default `{host}_{port}`, deterministic server id in the
    * reference's 5400–6400 band (the reference draws randomly,
    * `:228-233`; deterministic-by-config is strictly better for restart
    * stability), file offset store + schema history under `stateDir`
    * (replacing `InMemoryOffsetBackingStore` — the engine's own offsets
    * must survive restarts somewhere durable), `connector.properties`
    * overrides merged LAST (`:254-256`). */
  def engineProps(opts: CdcOptions, stateDir: String): Properties = {
    val v = CdcOptions.parseUrl(opts.url)
    val p = new Properties()
    if (v.vendor == "mongodb") {
      // mongo config is its own shape (reference `CDCSourceUtil.java:171-204`):
      // parseUrl only vendor-matches mongodb urls (host/db stay in `host`)
      val hostPart = v.host.takeWhile(_ != '/')
      val db = v.host.dropWhile(_ != '/').stripPrefix("/").takeWhile(_ != '?')
      require(db.nonEmpty,
        s"mongodb url must name a database (mongodb://host:port/db): ${opts.url}")
      val serverName = hostPart.replace(':', '_')
      p.setProperty("name", serverName)
      p.setProperty("topic.prefix", serverName)
      p.setProperty("connector.class", ConnectorClasses("mongodb"))
      p.setProperty("mongodb.connection.string", opts.url)
      p.setProperty("database.include.list", db)
      p.setProperty("collection.include.list", s"$db.${opts.table}")
    } else {
      val serverName = s"${v.host}_${v.port}"
      p.setProperty("name", serverName)
      p.setProperty("topic.prefix", serverName)
      p.setProperty("connector.class", ConnectorClasses(v.vendor))
      p.setProperty("database.hostname", v.host)
      p.setProperty("database.port", v.port.toString)
      opts.username.foreach(p.setProperty("database.user", _))
      opts.password.foreach(p.setProperty("database.password", _))
      if (v.vendor == "mysql") {
        p.setProperty("database.server.id",
          (5400 + Math.floorMod(s"$serverName/${opts.table}".hashCode, 1000)).toString)
        p.setProperty("database.include.list", v.database)
      } else p.setProperty("database.dbname", v.database)
      p.setProperty("table.include.list", s"${v.database}.${opts.table}")
    }
    p.setProperty("offset.storage", "org.apache.kafka.connect.storage.FileOffsetBackingStore")
    p.setProperty("offset.storage.file.filename", s"$stateDir/offsets.dat")
    p.setProperty("offset.flush.interval.ms", "1000")
    p.setProperty("schema.history.internal", "io.debezium.storage.file.history.FileSchemaHistory")
    p.setProperty("schema.history.internal.file.filename", s"$stateDir/history.dat")
    opts.connectorProperties.foreach { case (k, vv) => p.setProperty(k, vv) }
    p
  }

  /** Envelope spool: buffered, atomically-published JSON files. Appends
    * happen on the engine's single consumer thread; a daemon timer flushes
    * any lingering partial batch every `maxLingerMs` so a quiet stream
    * still publishes its tail (the engine thread parks between change
    * events — size-triggered flushing alone would hold the last batch
    * until shutdown). */
  final class Spool(dir: String, maxBuffered: Int = 200, maxLingerMs: Long = 500)
      extends AutoCloseable {
    Files.createDirectories(Paths.get(dir))
    private val buf = new java.lang.StringBuilder
    private var buffered = 0
    // Resume numbering past any existing part files: Spark's file stream
    // source tracks seen files BY NAME, so a restarted engine re-using
    // part-00000000.json would atomically overwrite a file the recovered
    // query already processed — and the new events would never be read.
    private val seq = {
      val s = Files.list(Paths.get(dir))
      try {
        var max = -1L
        val it = s.iterator()
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("part-") && n.endsWith(".json"))
            try max = math.max(max, n.stripPrefix("part-").stripSuffix(".json").toLong)
            catch { case _: NumberFormatException => }
        }
        new AtomicLong(max + 1)
      } finally s.close()
    }
    private val flusher = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-dbz-spool-flush")
      t.setDaemon(true)
      t
    })
    flusher.scheduleWithFixedDelay(() => flush(), maxLingerMs, maxLingerMs,
      TimeUnit.MILLISECONDS)

    def append(envelopeJson: String): Unit = synchronized {
      buf.append(envelopeJson).append('\n')
      buffered += 1
      if (buffered >= maxBuffered) flush()
    }

    def flush(): Unit = synchronized {
      if (buffered > 0) {
        val name = f"part-${seq.getAndIncrement()}%08d.json"
        val tmp = Paths.get(dir, s".$name.tmp")
        Files.write(tmp, buf.toString.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
        buf.setLength(0)
        buffered = 0
      }
    }

    override def close(): Unit = {
      flusher.shutdown()
      flush()
    }
  }

  /** A running engine; closing stops the engine thread and flushes the
    * spool. */
  final class Handle(engine: AnyRef, exec: java.util.concurrent.ExecutorService,
                     spool: Spool) extends AutoCloseable {
    override def close(): Unit = {
      engine.asInstanceOf[AutoCloseable].close()
      exec.shutdown()
      exec.awaitTermination(30, TimeUnit.SECONDS)
      spool.close()
    }
  }

  /** Build and start the embedded engine reflectively, spooling envelope
    * JSON values into `spoolDir`. All lookups go through the PUBLIC
    * interfaces (`DebeziumEngine$Builder`, `ChangeEvent`) — invoking
    * through implementation classes can hit package-private access. */
  def start(props: Properties, spoolDir: String): Handle = {
    require(available,
      "Debezium Embedded is not on the classpath; listening mode needs the " +
        "debezium-embedded + connector jars at runtime, or use envelope replay " +
        "(EnvelopeStream.replay) / mode=polling")
    val spool = new Spool(spoolDir)
    val engineCls = Class.forName("io.debezium.engine.DebeziumEngine")
    val builderCls = Class.forName("io.debezium.engine.DebeziumEngine$Builder")
    val eventCls = Class.forName("io.debezium.engine.ChangeEvent")
    val jsonCls = Class.forName("io.debezium.engine.format.Json")
    val valueM = eventCls.getMethod("value")
    val consumer: java.util.function.Consumer[AnyRef] = ev => {
      val v = valueM.invoke(ev)
      if (v != null) spool.append(v.toString)
    }
    val b0 = engineCls.getMethod("create", classOf[Class[_]]).invoke(null, jsonCls)
    val b1 = builderCls.getMethod("using", classOf[Properties]).invoke(b0, props)
    val b2 = builderCls.getMethod("notifying", classOf[java.util.function.Consumer[_]])
      .invoke(b1, consumer)
    val engine = builderCls.getMethod("build").invoke(b2)
    val exec = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-debezium-engine")
      t.setDaemon(true)
      t
    })
    exec.submit(engine.asInstanceOf[Runnable])
    new Handle(engine, exec, spool)
  }
}
