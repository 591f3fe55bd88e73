package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import graft.sources.CdcOptions

/** Trigger policy for CDC polling queries. The DataSource V2 API gives a
  * source no control over its query's trigger, so `polling.interval` and
  * `cron.expression` are honored HERE: build the writer trigger from the
  * same options the source was configured with.
  *
  *   - cron configured (O16) → `Trigger.AvailableNow()` — one-shot sweep
  *     per external cron fire (`CDCCronExecutor.java:91-96`);
  *   - otherwise → `Trigger.ProcessingTime(polling.interval seconds)` —
  *     the reference's poll-sleep loop (`DefaultPollingStrategy.java:95`,
  *     default 1 s, `CDCSourceConstants.java:77`).
  */
object CdcPoll {
  def trigger(opts: CdcOptions): Trigger =
    if (opts.cronExpression.nonEmpty) Trigger.AvailableNow()
    else Trigger.ProcessingTime(opts.pollingIntervalSec * 1000)

  /** Convenience for option-map call sites. */
  def trigger(options: Map[String, String]): Trigger =
    trigger(CdcOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(options).asJava)))
}
