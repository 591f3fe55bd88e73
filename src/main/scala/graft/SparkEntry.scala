package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract (see SURVEY.md §2.3): one entry per implemented operator,
  * each with a DuckDB-runnable oracle. Every query has a total ORDER BY and
  * aliases every computed column identically in Spark and oracle SQL.
  *
  * Each query models a reference operator of siddhi-io/siddhi-io-cdc (file
  * citations in Scaladoc per query builder in [[CoreQueries]]).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Change-stream
    * hydration: operation filter (O3) + dimension join + per-op counters. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.events(spark, dir)
    val c = Tables.customer(spark, dir)
    e.filter(col("event_type").isin("purchase", "signup"))
      .join(broadcast(c), e("user_id") === c("c_custkey"))
      .groupBy(col("event_type"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .orderBy(col("event_type"), col("c_mktsegment"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ PipelineQueries.oracleSql
}

/** SURVEY §2.3 Q1–Q12 — the t2 correctness contract over `events` (the CDC
  * stand-in table: event_id = polling column, event_type = operation, ts =
  * event time, props = semi-structured payload).
  */
object CoreQueries {

  /** Q1 — operation filter (O3): keep selected change-operation types.
    * Ref: RdbmsChangeDataCapture.java:65-137 (op ∈ user list). */
  private def q1(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "signup"))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** Q2 — before/after update image (O5): before_ column via lag per key.
    * Ref: RdbmsChangeDataCapture.java:169-190 (before_ prefix). */
  private def q2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("before_value"))
      .orderBy("user_id", "event_id")
  }

  /** Q3 — initial offset discovery (O13): MAX(polling.column), empty → -1.
    * Ref: DefaultPollingStrategy.java:109-132. */
  private def q3(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .agg(coalesce(max(col("event_id")), lit(-1L)).as("last_offset"))

  /** Q4 — incremental delta scan (O14): rows strictly after stored offset.
    * Ref: DefaultPollingStrategy.java:134-168 (WHERE col > ?). */
  private def q4(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") > 900)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** Q5 — gap detection (O15): missing ranges in a numeric sequence.
    * Distributed via [[graft.operators.SequenceGaps]] — a range shuffle +
    * per-partition scan + O(numPartitions) seam pass, instead of the
    * naive single-partition global window.
    * Ref: WaitOnMissingRecordPollingStrategy.java:116-132. */
  private def q5(s: SparkSession, dir: String): DataFrame =
    graft.operators.SequenceGaps.detect(
      Tables.events(s, dir).filter(col("event_type") === "purchase"), "event_id")
      .orderBy("missing_from")

  /** Q6 — offset recovery + update application (O17): latest state per key.
    * Ref: CDCSource.java:842-870 (replay) + update semantics. */
  private def q6(s: SparkSession, dir: String): DataFrame = {
    // ts_ns (exact nanos) not the µs-truncated ts: ordering must match the
    // oracle's ns-resolution ORDER BY ts DESC bit-for-bit.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** Q7 — per-operation event counters (O20 metrics).
    * Ref: metrics/Metrics.java:34-121 (events per op). */
  private def q7(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** Q8 — micro-batch/interval bucketing (O14/O16): per-day batch rollup.
    * The decimal(18,2) sum makes the aggregate order-independent; the final
    * projection exposes only driver-safe output types (VARCHAR day, DOUBLE
    * total — DATE/DECIMAL columns hash differently between pyarrow's
    * `Decimal`/`date` objects and DuckDB's float64/datetime64 path).
    * Ref: CDCCronExecutor.java:91-96 (one sweep per interval). */
  private def q8(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("d"), col("cnt"), col("total"))
      .orderBy("d")

  /** Q9 — semi-structured decode (O10): typed field out of JSON props.
    * Ref: MongoChangeDataCapture.java:109-144 (extended-JSON coercion). */
  private def q9(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** Q10 — downstream hydration join (§2.1 sink table): stream ⋈ dimension.
    * customer is the small dimension → broadcast (no shuffle of events at
    * scale). Ref: TestCaseOfCDCPollingMode.java:129-131 (table sink). */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val c = Tables.customer(s, dir)
    e.filter(col("event_type") === "purchase")
      .join(broadcast(c), e("user_id") === c("c_custkey"))
      .select(e("event_id"), e("user_id"), c("c_name"), e("value"))
      .orderBy("event_id")
  }

  /** Q11 — delete application (`delete … on` semantics): anti-join survivors.
    * Ref: TestCaseOfCDCListeningMode.java:179-181. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val deletes = Tables.events(s, dir)
      .filter(col("event_type") === "error").select(col("user_id"))
    c.join(deletes, c("c_custkey") === deletes("user_id"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q12 — at-least-once dedup (SURVEY §7.4; driver-mandated dedup op).
    * Ref: at-least-once delivery ChangeDataCapture.java:88. */
  private def q12(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_op_filter" -> q1 _,
    "q2_before_after" -> q2 _,
    "q3_initial_offset" -> q3 _,
    "q4_delta_scan" -> q4 _,
    "q5_gap_detect" -> q5 _,
    "q6_latest_state" -> q6 _,
    "q7_op_counters" -> q7 _,
    "q8_batch_rollup" -> q8 _,
    "q9_json_decode" -> q9 _,
    "q10_hydration_join" -> q10 _,
    "q11_delete_apply" -> q11 _,
    "q12_dedup" -> q12 _,
  )

  val oracleSql: Map[String, String] = Map(
    "q1_op_filter" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_type IN ('purchase', 'signup')
        |ORDER BY event_id""".stripMargin,
    "q2_before_after" ->
      """SELECT user_id, event_id, value,
        |       LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS before_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    "q3_initial_offset" ->
      "SELECT COALESCE(MAX(event_id), -1) AS last_offset FROM events",
    "q4_delta_scan" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_id > 900
        |ORDER BY event_id""".stripMargin,
    "q5_gap_detect" ->
      """SELECT event_id + 1 AS missing_from, next_id - 1 AS missing_to
        |FROM (SELECT event_id,
        |             LEAD(event_id) OVER (ORDER BY event_id) AS next_id
        |      FROM events WHERE event_type = 'purchase') g
        |WHERE next_id - event_id > 1
        |ORDER BY missing_from""".stripMargin,
    "q6_latest_state" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT e.*,
        |             ROW_NUMBER() OVER (PARTITION BY user_id
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events e) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q7_op_counters" ->
      """SELECT event_type, COUNT(*) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q8_batch_rollup" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1
        |ORDER BY d""".stripMargin,
    "q9_json_decode" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin,
    "q10_hydration_join" ->
      """SELECT e.event_id, e.user_id, c.c_name, e.value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,
    "q11_delete_apply" ->
      """SELECT c.c_custkey, c.c_name
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM events e
        |                  WHERE e.user_id = c.c_custkey AND e.event_type = 'error')
        |ORDER BY c.c_custkey""".stripMargin,
    "q12_dedup" ->
      """SELECT DISTINCT user_id, event_type
        |FROM events
        |ORDER BY user_id, event_type""".stripMargin,
  )
}
