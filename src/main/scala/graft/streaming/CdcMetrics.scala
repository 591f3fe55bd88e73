package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.core.ChangeEnvelope

/** Observability (reference O20, the metrics package: `metrics/Metrics.java`,
  * `metrics/ListeningMetrics.java`, `metrics/PollingMetrics.java`): per-op event
  * counters, total reads, last-receive time, IDLE detection — via the
  * `Dataset.observe` API + a `StreamingQueryListener`, replacing the
  * reference's Prometheus registry with Spark's native metrics plumbing
  * (zero per-row overhead: observed metrics are computed inside the
  * existing plan, no extra pass).
  */
object CdcMetrics {

  val ObservationName = "cdc"
  /** Reference idle threshold: 8 s (`ListeningMetrics.java:51-60`). */
  val IdleThresholdMs = 8000L

  /** Status enum with the reference's ordinal order
    * (`metrics/CDCStatus.java:26`: CONSUMING, IDLE, ERROR, SUCCESS) — the
    * `db_status` gauge exports the ordinal (`PollingMetrics.java:119-130`). */
  sealed abstract class CdcStatus(val ordinal: Int)
  case object Consuming extends CdcStatus(0)
  case object Idle extends CdcStatus(1)
  case object ErrorStatus extends CdcStatus(2)
  case object Success extends CdcStatus(3)

  /** Attach per-op observed metrics to a flattened change stream. */
  def observed(flat: DataFrame): DataFrame = {
    val op = col("_op")
    flat.observe(ObservationName,
      count(lit(1)).as("events"),
      sum(when(op === ChangeEnvelope.Insert, 1L).otherwise(0L)).as("inserts"),
      sum(when(op === ChangeEnvelope.Update, 1L).otherwise(0L)).as("updates"),
      sum(when(op === ChangeEnvelope.Delete, 1L).otherwise(0L)).as("deletes"))
  }

  /** One poll/micro-batch detail record (the reference keeps a ring of
    * the last `polling.history.size` of these —
    * `PollingMetrics.java:139-149`, default 10 `CDCSource.java:302-309`). */
  case class PollDetail(batchId: Long, events: Long, durationMs: Long, ok: Boolean)

  val DefaultHistorySize = 10

  /** Listener sized from the source options (`polling.history.size`,
    * reference default 10 — `CDCSource.java:627-630`). */
  def listener(opts: graft.sources.CdcOptions): Listener =
    new Listener(opts.pollingHistorySize)

  /** Listener accumulating the reference's counter/gauge set. */
  class Listener(val historySize: Int = DefaultHistorySize) extends StreamingQueryListener {
    require(historySize > 0, s"historySize must be positive, got $historySize")
    private val ring = new java.util.ArrayDeque[PollDetail](historySize)
    /** Last `historySize` micro-batch details, newest last. */
    def pollHistory: Seq[PollDetail] =
      ring.synchronized { scala.jdk.CollectionConverters.IteratorHasAsScala(ring.iterator).asScala.toSeq }
    private def record(d: PollDetail): Unit = ring.synchronized {
      if (ring.size >= historySize) ring.removeFirst()
      ring.addLast(d)
    }
    val totalReads = new AtomicLong(0)
    val inserts = new AtomicLong(0)
    val updates = new AtomicLong(0)
    val deletes = new AtomicLong(0)
    val errors = new AtomicLong(0)
    val lastReceiveTimeMs = new AtomicLong(-1L)
    /** `events_in_last_polling_interval` gauge
      * (`PollingMetrics.java:132-137`). */
    val eventsInLastBatch = new AtomicLong(0)
    private val lastError = new AtomicReference[String](null)

    def status: CdcStatus =
      if (lastError.get != null) ErrorStatus
      else if (lastReceiveTimeMs.get < 0 ||
        System.currentTimeMillis() - lastReceiveTimeMs.get > IdleThresholdMs) Idle
      else Consuming

    /** `db_status` gauge value: the status ordinal, −1 before any batch
      * (`PollingMetrics.java:119-130`). */
    def dbStatusOrdinal: Int =
      if (lastError.get == null && lastReceiveTimeMs.get < 0) -1 else status.ordinal

    /** `idle_time` gauge: seconds since the last received event, 0 before
      * any batch (`PollingMetrics.java:106-117`). */
    def idleTimeSec: Long = {
      val t = lastReceiveTimeMs.get
      if (t < 0) 0L else (System.currentTimeMillis() - t) / 1000
    }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics
      if (m.containsKey(ObservationName)) {
        val row = m.get(ObservationName)
        val n = row.getAs[Long]("events")
        eventsInLastBatch.set(n)
        if (n > 0) {
          totalReads.addAndGet(n)
          inserts.addAndGet(row.getAs[Long]("inserts"))
          updates.addAndGet(row.getAs[Long]("updates"))
          deletes.addAndGet(row.getAs[Long]("deletes"))
          lastReceiveTimeMs.set(System.currentTimeMillis())
        }
        record(PollDetail(e.progress.batchId, n,
          e.progress.batchDuration, ok = true))
      }
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach { ex =>
        lastError.set(ex)
        errors.incrementAndGet()
        record(PollDetail(batchId = -1L, events = 0L, durationMs = 0L, ok = false))
      }
  }

  /** Metric-name key for a captured table: `host/table`
    * (`PollingMetrics.java:181-183`). */
  def databaseUrlKey(host: String, table: String): String = s"$host/$table"

  /** JDBC URL shortened for metric names (reference
    * `metrics/MetricsUtils.java:44-110`): drop the query/property tail per
    * vendor (mysql/postgresql → before `?`; sqlserver/derby → before `;`;
    * oracle/db2 → truncate after the host), then cap at 30 chars + the
    * current identifier run, appending `..` whenever something was cut. */
  def shortenedJdbcUrl(url: String): String = {
    val vendor = url.split(":").lift(1).getOrElse("")
    val formatted = vendor match {
      case "mysql" | "postgresql" =>
        val parts = url.split("\\?")
        if (parts.length == 1) parts(0) else parts(0) + ".."
      case "sqlserver" | "derby" =>
        val parts = url.split(";")
        if (parts.length == 1) parts(0) else parts(0) + ".."
      case "oracle" =>
        // keep `...@host`, cut the trailing `:port:sid` (reference reverses
        // the string to locate the LAST `@...:` — same effect)
        val at = url.indexOf('@')
        if (at < 0) url
        else {
          val colon = url.indexOf(':', at + 1)
          if (colon < 0) url else url.substring(0, colon) + ".."
        }
      case "db2" =>
        val idx = url.lastIndexOf("db2:") + 3
        val colon = url.indexOf(':', idx + 1)
        if (colon < 0) url else url.substring(0, colon) + ".."
      case _ => url
    }
    // cap at 30 chars, extending through the current identifier run
    if (formatted.length <= 30) formatted
    else {
      var i = 30
      while (i < formatted.length - 1 && Character.isLetterOrDigit(formatted.charAt(i))) i += 1
      if (i == formatted.length - 1) formatted else formatted.substring(0, i) + ".."
    }
  }
}
