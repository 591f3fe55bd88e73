package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Change-event envelope schema + flatten kernel — the semantic heart of the
  * engine (SURVEY §7.1 step 1).
  *
  * Models the Debezium/Kafka-Connect envelope the reference consumes
  * (reference: `listening/RdbmsChangeDataCapture.java:49-197`, constants
  * `util/CDCSourceConstants.java:58-67,101-103`) as a nested Spark row
  * `(op, before, after, source.ts_ms, ts_ms)` and lowers every flatten rule
  * to pure `Column` expressions, so the whole kernel stays inside
  * whole-stage codegen — no UDFs, no per-row Scala.
  *
  * Semantics replicated exactly:
  *   - single-op mode (`operation='insert'|'update'|'delete'`): only events
  *     of that op survive; insert → after-image columns; delete → before-
  *     image columns prefixed `before_`; update → interleaved
  *     `before_c, c` pairs (`RdbmsChangeDataCapture.java:140-190`).
  *   - multi-op mode (comma list): all selected ops in one schema, with
  *     absent image columns **default-padded** ("", false, 0.0, 0 —
  *     `ChangeDataCapture.getDefaultValue`, `ChangeDataCapture.java:172-184`);
  *     padding happens ONLY in multi-op mode (`RdbmsChangeDataCapture.java:81,123`
  *     vs absent in `:140-190`) — a reference quirk kept on purpose.
  *   - snapshot-read events (`op='r'`) are dropped in both modes (default
  *     branch, `RdbmsChangeDataCapture.java:128-131`).
  *   - transport properties `[operation, source.ts_ms, ts_ms]`
  *     (`RdbmsChangeDataCapture.java:70-75`) become ordinary metadata
  *     columns `_op`, `_source_ts_ms`, `_ts_ms` (Spark-first: metadata as
  *     columns composes with every downstream operator).
  */
object ChangeEnvelope {

  /** Debezium op codes (`CDCSourceConstants.java:61-65`). */
  val OpInsert = "c"
  val OpUpdate = "u"
  val OpDelete = "d"
  val OpRead = "r"

  /** User-facing operation names (`CDCSourceConstants.java:38-40`). */
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"

  val BeforePrefix = "before_"

  /** op code → user-facing name; 'r' intentionally unmapped (dropped). */
  val opName: Map[String, String] =
    Map(OpInsert -> Insert, OpUpdate -> Update, OpDelete -> Delete)
  private val nameToCode = opName.map(_.swap)

  /** Envelope StructType for a given table row schema (FIXTURES.md §3). */
  def schema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("before", rowSchema, nullable = true),
    StructField("after", rowSchema, nullable = true),
    StructField("source", StructType(Seq(StructField("ts_ms", LongType)))),
    StructField("ts_ms", LongType)))

  /** Type-default literal for padded image columns
    * (`ChangeDataCapture.java:172-184`: STRING→"", BOOLEAN→false,
    * FLOAT32/64→0.0, everything else→0), cast to the declared type. */
  def defaultLiteral(dt: DataType): Column = dt match {
    case StringType => lit("")
    case BooleanType => lit(false)
    case FloatType | DoubleType => lit(0.0).cast(dt)
    case _ => lit(0).cast(dt)
  }

  /** Parse a user `operation` option ("insert" or "insert,update,delete") →
    * trimmed list (`ChangeDataCapture.createOperationList`,
    * `ChangeDataCapture.java:164-170`). */
  def operationList(operation: String): Seq[String] =
    operation.split(",").toSeq.map(_.trim.toLowerCase)

  private def transportProps(df: DataFrame): Seq[Column] = Seq(
    coalesce(opName.foldLeft(lit(null).cast(StringType)) { case (acc, (code, name)) =>
      when(col("op") === code, lit(name)).otherwise(acc)
    }).as("_op"),
    col("source.ts_ms").as("_source_ts_ms"),
    col("ts_ms").as("_ts_ms"))

  /** Flatten an envelope DataFrame per the user's operation selection.
    *
    * Output schema:
    *   - single insert: table columns
    *   - single delete: `before_*` columns
    *   - single update / multi-op: interleaved `before_c, c` per field
    *     (update test ordering `[before_id, id, before_name, name]`,
    *     `TestCaseOfCDCListeningMode.java:328-329`)
    * plus `_op, _source_ts_ms, _ts_ms` metadata columns.
    */
  def flatten(envelope: DataFrame, rowSchema: StructType, operation: String): DataFrame = {
    val ops = operationList(operation)
    val codes = ops.flatMap(nameToCode.get)
    require(codes.nonEmpty, s"unsupported operation list: $operation")
    val filtered = envelope.filter(col("op").isin(codes: _*))

    val imageCols: Seq[Column] =
      if (ops.size == 1) ops.head match {
        case Insert => rowSchema.fields.toSeq.map(f => col(s"after.${f.name}").as(f.name))
        case Delete => rowSchema.fields.toSeq.map(f =>
          col(s"before.${f.name}").as(BeforePrefix + f.name))
        case Update => rowSchema.fields.toSeq.flatMap(f => Seq(
          col(s"before.${f.name}").as(BeforePrefix + f.name),
          col(s"after.${f.name}").as(f.name)))
      } else rowSchema.fields.toSeq.flatMap { f =>
        // multi-op: pad the absent image with the type default
        val before = when(col("op") === OpInsert, defaultLiteral(f.dataType))
          .otherwise(col(s"before.${f.name}")).as(BeforePrefix + f.name)
        val after = when(col("op") === OpDelete, defaultLiteral(f.dataType))
          .otherwise(col(s"after.${f.name}")).as(f.name)
        Seq(before, after)
      }

    filtered.select(imageCols ++ transportProps(filtered): _*)
  }

  /** Scalar type normalization (O8, `RdbmsChangeDataCapture.java:199-219`):
    * short/byte → int; decimal → long when scale ≤ 0 else double. The
    * reference decides decimal→long/double per *value* (stripTrailingZeros);
    * a typed engine must decide per column, so we use the declared scale —
    * values with trailing zeros normalize identically, and the divergence
    * (a scale>0 column whose every value is integral) is documented here.
    */
  def normalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case ShortType | ByteType => col(f.name).cast(IntegerType).as(f.name)
        case d: DecimalType if d.scale <= 0 => col(f.name).cast(LongType).as(f.name)
        case _: DecimalType => col(f.name).cast(DoubleType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Operation filter (O3): keep rows whose `_op` ∈ selected operations —
    * `df.filter(col("_op").isin(...))`, pushed below projections by
    * Catalyst (reference drops non-matching events row-at-a-time,
    * `RdbmsChangeDataCapture.java:65-137`). */
  def opFilter(flat: DataFrame, operations: Seq[String]): DataFrame =
    flat.filter(col("_op").isin(operations: _*))
}
