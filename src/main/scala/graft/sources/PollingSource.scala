package graft.sources

import java.sql.{Connection, DriverManager, ResultSet, Types}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CDC polling source (reference O11–O17) as a DataSource V2
  * `MicroBatchStream`: `spark.readStream.format("cdc")
  * .option("mode","polling").option("url", ...).option("table.name", ...)
  * .option("polling.column", ...)`.
  *
  * Semantics mirrored from the reference:
  *   - initial offset = `SELECT MAX(pollingColumn)`, empty table → −1:
  *     pre-existing rows are NOT replayed (`DefaultPollingStrategy.java:109-132`);
  *   - each micro-batch reads `WHERE col > last AND col <= latest`
  *     (`DefaultPollingStrategy.java:134-168`) — the delta predicate is
  *     executed BY the database (pushdown, `:142-145`);
  *   - column names lowercased (`:153`);
  *   - scalar normalization (O8) applied at schema inference: narrow ints
  *     → int, decimal scale ≤ 0 → long else double
  *     (`RdbmsChangeDataCapture.java:199-219`);
  *   - gap hold-back (O15, `WaitOnMissingRecordPollingStrategy.java:64-182`):
  *     with `wait.on.missed.record`, `latestOffset` refuses to advance past
  *     a hole in the numeric sequence until the missing row arrives or
  *     `missed.record.waiting.timeout` expires — head-of-line blocking
  *     exactly like the reference;
  *   - offsets live in the Structured Streaming checkpoint (replaces
  *     `InMemoryOffsetBackingStore` + `CdcState`, exactly-once not
  *     at-least-once);
  *   - `polling.interval` / cron (O16) are honored at the query level via
  *     [[graft.streaming.CdcPoll.trigger]] (ProcessingTime(interval) /
  *     AvailableNow) — a V2 source cannot set its own query trigger.
  *
  * Scale design: the reference polls single-threaded on one JVM; here each
  * micro-batch splits the (last, latest] numeric range into
  * `numPartitions` executor-parallel JDBC range scans, so ingest
  * throughput scales with the cluster, and the source DB sees only
  * indexed range predicates.
  */
class CdcTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = CdcOptions(options)
    require(opts.mode == CdcOptions.ModePolling,
      "mode=listening requires a user-declared row schema (the reference declares it " +
        "on the stream, TestCaseOfCDCListeningMode.java:79-87) and so is not served by " +
        "this schema-inferring format: use EnvelopeStream.listen(spark, opts, rowSchema, " +
        "stateDir) — a live Debezium log-tail when the debezium jars are on the runtime " +
        "classpath (DebeziumRuntime.available) — or EnvelopeStream.replay for recorded " +
        "envelopes; both feed the same flatten/offset/checkpoint pipeline. mode=polling " +
        "is handled here.")
    Jdbc.withConnection(opts) { conn =>
      Jdbc.inferSchema(conn, opts.table)
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = CdcOptions(new CaseInsensitiveStringMap(properties))
    new CdcTable(schema, opts)
  }
}

class CdcTable(schema: StructType, opts: CdcOptions) extends Table with SupportsRead {
  override def name(): String = s"cdc:${opts.table}"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] = {
    val s = new java.util.HashSet[TableCapability]()
    s.add(TableCapability.MICRO_BATCH_READ)
    s.add(TableCapability.BATCH_READ)
    s
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(schema, opts)
}

class CdcScanBuilder(schema: StructType, opts: CdcOptions) extends ScanBuilder {
  override def build(): Scan = new CdcScan(schema, opts)
}

class CdcScan(schema: StructType, opts: CdcOptions) extends Scan {
  override def readSchema(): StructType = schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(schema, opts)
  override def toBatch: Batch = new CdcBatch(schema, opts)
}

/** Offset = largest polling-column value emitted; serialized as
  * `num:<v>` / `str:<v>` / `none` (empty table, −1 analog). */
case class CdcOffset(value: Option[String], numeric: Boolean) extends Offset {
  override def json(): String = value match {
    case Some(v) => (if (numeric) "num:" else "str:") + v
    case None => "none"
  }
  def asLong: Long = value.map(_.toLong).getOrElse(-1L)
}

object CdcOffset {
  def parse(json: String): CdcOffset = json match {
    case "none" => CdcOffset(None, numeric = true)
    case s if s.startsWith("num:") => CdcOffset(Some(s.drop(4)), numeric = true)
    case s if s.startsWith("str:") => CdcOffset(Some(s.drop(4)), numeric = false)
    case other => throw new IllegalArgumentException(s"bad CdcOffset: $other")
  }
}

class CdcMicroBatchStream(schema: StructType, opts: CdcOptions) extends MicroBatchStream {
  private val pollingCol = opts.pollingColumn.get.toLowerCase
  private val numericCol: Boolean = schema(pollingCol).dataType match {
    case IntegerType | LongType | ShortType => true
    case _ => false
  }
  /** Last offset the engine has planned through (restored from checkpoint
    * via deserializeOffset on recovery). */
  private val lastPlanned = new AtomicReference[CdcOffset](null)
  /** Gap hold-back state (O15, mirrors `waitingFor`/`waitingFrom` in
    * `WaitOnMissingRecordPollingStrategy.java:72-73,116-131`): the hole we
    * are waiting on and when we first saw it. Driver-side, like the
    * reference's poll thread. */
  @volatile private var gapHole: Long = -1L
  @volatile private var gapFirstSeenMs: Long = -1L
  private def gapReset(): Unit = { gapHole = -1L; gapFirstSeenMs = -1L }

  private def queryMax(): CdcOffset = Jdbc.withConnection(opts) { conn =>
    val rs = conn.createStatement().executeQuery(
      s"SELECT MAX($pollingCol) FROM ${opts.table}")
    rs.next()
    val v = rs.getString(1)
    CdcOffset(Option(v), numericCol)
  }

  /** Smallest present value strictly above `v` (None if none). */
  private def queryMinAbove(v: Long): Option[Long] = Jdbc.withConnection(opts) { conn =>
    val ps = conn.prepareStatement(
      s"SELECT MIN($pollingCol) FROM ${opts.table} WHERE $pollingCol > ?")
    ps.setLong(1, v)
    val rs = ps.executeQuery()
    rs.next()
    val r = rs.getLong(1)
    if (rs.wasNull()) None else Some(r)
  }

  /** End of the contiguous run beginning at present value `start`:
    * smallest present value >= start whose successor is absent (the DB
    * executes the self-join — no data leaves the source). */
  private def runEnd(start: Long): Long = Jdbc.withConnection(opts) { conn =>
    val sql =
      s"""SELECT MIN(a.$pollingCol) FROM ${opts.table} a
         |LEFT OUTER JOIN ${opts.table} b ON b.$pollingCol = a.$pollingCol + 1
         |WHERE a.$pollingCol >= ? AND b.$pollingCol IS NULL""".stripMargin
    val ps = conn.prepareStatement(sql)
    ps.setLong(1, start)
    val rs = ps.executeQuery()
    rs.next()
    rs.getLong(1)
  }

  override def initialOffset(): Offset = {
    val o = queryMax()
    lastPlanned.set(o)
    o
  }

  override def deserializeOffset(json: String): Offset = {
    val o = CdcOffset.parse(json)
    lastPlanned.set(o)
    o
  }

  override def latestOffset(): Offset = {
    val max = queryMax()
    if (!opts.waitOnMissedRecord || !numericCol || max.value.isEmpty) return max
    val last = Option(lastPlanned.get()).map(_.asLong).getOrElse(-1L)
    val maxV = max.asLong
    if (maxV <= last) { gapReset(); return CdcOffset(Some(last.toString), numericCol) }
    queryMinAbove(last) match {
      // queryMax saw a larger value on a SEPARATE connection; a concurrent
      // delete in between can make the min query come back empty — degrade
      // to a no-op poll (hold the offset) instead of failing the query
      case None => CdcOffset(Some(last.toString), numericCol)
      case Some(minNew) if last >= 0 && minNew > last + 1 =>
        // hole immediately after last (reference: current - last > 1)
        holdOrRelease(holdAt = last, hole = last + 1)
      case Some(minNew) =>
        val end = runEnd(minNew)
        if (end >= maxV) { gapReset(); max } // unbroken run to max
        else holdOrRelease(holdAt = end, hole = end + 1)
    }
  }

  /** Hold the offset at `holdAt` while waiting on `hole`; on timeout,
    * resume past this ONE hole to the end of the next contiguous run
    * (reference resumes at the next scanned row and re-waits per hole:
    * `WaitOnMissingRecordPollingStrategy.java:124-143`). */
  private def holdOrRelease(holdAt: Long, hole: Long): CdcOffset = {
    val now = System.currentTimeMillis()
    if (gapHole != hole) { gapHole = hole; gapFirstSeenMs = now }
    val timedOut = opts.missedRecordTimeoutSec >= 0 &&
      now - gapFirstSeenMs >= opts.missedRecordTimeoutSec * 1000
    if (!timedOut) CdcOffset(Some(holdAt.toString), numericCol)
    else queryMinAbove(holdAt) match {
      // concurrent delete between queryMax and here: keep holding; the
      // next poll re-evaluates from a fresh max
      case None => CdcOffset(Some(holdAt.toString), numericCol)
      case Some(resume) =>
        gapReset()
        CdcOffset(Some(runEnd(resume).toString), numericCol)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset]
    val e = end.asInstanceOf[CdcOffset]
    lastPlanned.set(e)
    if (e.value.isEmpty || s.value == e.value) return Array.empty
    if (numericCol) {
      val lo = s.asLong
      val hi = e.asLong
      val span = hi - lo
      val n = math.max(1, math.min(opts.numPartitions.toLong, span)).toInt
      val step = span / n
      (0 until n).map { i =>
        val pLo = lo + i * step
        val pHi = if (i == n - 1) hi else lo + (i + 1) * step
        CdcInputPartition(Some(pLo.toString), pHi.toString, numeric = true)
      }.toArray
    } else {
      Array(CdcInputPartition(s.value, e.value.get, numeric = false))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CdcReaderFactory(Jdbc.connectionSpec(opts), opts.table, pollingCol, schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Batch (full-snapshot) path: one range-partitioned scan of the table. */
class CdcBatch(schema: StructType, opts: CdcOptions) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    Array(CdcInputPartition(None, null, numeric = false)) // full scan
  override def createReaderFactory(): PartitionReaderFactory =
    CdcReaderFactory(Jdbc.connectionSpec(opts), opts.table,
      opts.pollingColumn.map(_.toLowerCase).getOrElse(""), schema)
}

/** (loExclusive, hiInclusive] range; `hi == null` → unbounded full scan. */
case class CdcInputPartition(lo: Option[String], hi: String, numeric: Boolean)
  extends InputPartition

case class CdcReaderFactory(conn: Jdbc.ConnectionSpec, table: String,
                            pollingCol: String, schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdcPartitionReader(conn, table, pollingCol, schema,
      partition.asInstanceOf[CdcInputPartition])
}

/** Executor-side JDBC range reader: vendor executes the range predicate
  * (pushdown), we stream the ResultSet into InternalRows. */
class CdcPartitionReader(spec: Jdbc.ConnectionSpec, table: String, pollingCol: String,
                         schema: StructType, part: CdcInputPartition)
  extends PartitionReader[InternalRow] {

  private var conn: Connection = _
  private var rs: ResultSet = _
  private val converters = schema.fields.map(f => Jdbc.converter(f.dataType))

  private def ensureOpen(): Unit = if (conn == null) {
    conn = Jdbc.connect(spec)
    val cols = schema.fieldNames.mkString(", ")
    val (where, binds) = part match {
      case CdcInputPartition(None, null, _) => ("", Seq.empty[String])
      case CdcInputPartition(None, hi, _) =>
        (s" WHERE $pollingCol <= ?", Seq(hi))
      case CdcInputPartition(Some(lo), hi, _) =>
        (s" WHERE $pollingCol > ? AND $pollingCol <= ?", Seq(lo, hi))
    }
    val ps = conn.prepareStatement(s"SELECT $cols FROM $table$where")
    binds.zipWithIndex.foreach { case (b, i) =>
      if (part.numeric) ps.setLong(i + 1, b.toLong) else ps.setString(i + 1, b)
    }
    rs = ps.executeQuery()
  }

  override def next(): Boolean = { ensureOpen(); rs.next() }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val v = converters(i)(rs, i + 1)
      row.update(i, if (rs.wasNull()) null else v)
      i += 1
    }
    row
  }

  override def close(): Unit = {
    if (rs != null) rs.close()
    if (conn != null) conn.close()
  }
}

/** JDBC plumbing shared by driver (offset queries, schema inference) and
  * executors (range readers). */
object Jdbc {
  case class ConnectionSpec(url: String, props: Map[String, String]) extends Serializable

  def connectionSpec(opts: CdcOptions): ConnectionSpec = {
    val p = opts.username.map("user" -> _).toMap ++
      opts.password.map("password" -> _).toMap ++ opts.connectorProperties
    ConnectionSpec(opts.url, p)
  }

  def connect(spec: ConnectionSpec): Connection = {
    val props = new java.util.Properties()
    spec.props.foreach { case (k, v) => props.setProperty(k, v) }
    DriverManager.getConnection(spec.url, props)
  }

  def withConnection[A](opts: CdcOptions)(f: Connection => A): A = {
    val conn = connect(connectionSpec(opts))
    try f(conn) finally conn.close()
  }

  /** Schema from JDBC metadata: names lowercased (O14), scalars normalized
    * per O8 (`RdbmsChangeDataCapture.java:199-219`). */
  def inferSchema(conn: Connection, table: String): StructType = {
    val rs = conn.createStatement().executeQuery(s"SELECT * FROM $table WHERE 1=0")
    val md = rs.getMetaData
    StructType((1 to md.getColumnCount).map { i =>
      val dt = md.getColumnType(i) match {
        case Types.INTEGER | Types.SMALLINT | Types.TINYINT => IntegerType
        case Types.BIGINT => LongType
        case Types.FLOAT | Types.DOUBLE => DoubleType
        case Types.REAL => FloatType
        case Types.NUMERIC | Types.DECIMAL =>
          if (md.getScale(i) <= 0) LongType else DoubleType
        case Types.BOOLEAN | Types.BIT => BooleanType
        case Types.TIMESTAMP => TimestampType
        case Types.DATE => DateType
        case _ => StringType
      }
      StructField(md.getColumnName(i).toLowerCase, dt,
        md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
    })
  }

  /** ResultSet → InternalRow field converter per Spark type. */
  def converter(dt: DataType): (ResultSet, Int) => Any = dt match {
    case IntegerType => (rs, i) => rs.getInt(i)
    case LongType => (rs, i) =>
      // NUMERIC(p,0) normalized to long: read via BigDecimal to be safe
      val bd = rs.getBigDecimal(i); if (bd == null) null else bd.longValue()
    case DoubleType => (rs, i) => rs.getDouble(i)
    case FloatType => (rs, i) => rs.getFloat(i)
    case BooleanType => (rs, i) => rs.getBoolean(i)
    case StringType => (rs, i) => UTF8String.fromString(rs.getString(i))
    case TimestampType => (rs, i) =>
      val t = rs.getTimestamp(i)
      if (t == null) null
      else math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case DateType => (rs, i) =>
      val d = rs.getDate(i)
      if (d == null) null else d.toLocalDate.toEpochDay.toInt
    case other => (rs, i) => UTF8String.fromString(String.valueOf(rs.getObject(i)))
  }
}
