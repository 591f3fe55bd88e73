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

  sealed trait CdcStatus
  case object Consuming extends CdcStatus
  case object Idle extends CdcStatus
  case object ErrorStatus extends CdcStatus

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

  /** Listener accumulating the reference's counter/gauge set. */
  class Listener(historySize: Int = DefaultHistorySize) extends StreamingQueryListener {
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
    private val lastError = new AtomicReference[String](null)

    def status: CdcStatus =
      if (lastError.get != null) ErrorStatus
      else if (lastReceiveTimeMs.get < 0 ||
        System.currentTimeMillis() - lastReceiveTimeMs.get > IdleThresholdMs) Idle
      else Consuming

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics
      if (m.containsKey(ObservationName)) {
        val row = m.get(ObservationName)
        val n = row.getAs[Long]("events")
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
}
