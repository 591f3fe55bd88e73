package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Flatten-kernel semantics against the reference's round-trip expectations
  * (TestCaseOfCDCListeningMode.java:136-139, 233-236, 328-329). */
class ChangeEnvelopeSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType)))

  private def envelope(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      ChangeEnvelope.schema(rowSchema))

  private def ev(op: String, before: Row, after: Row, srcTs: Long = 100L, ts: Long = 200L): Row =
    Row(op, before, after, Row(srcTs), ts)

  private val insertEv = ev("c", null, Row("e001", "empName"))
  private val updateEv = ev("u", Row("e001", "empName"), Row("e001", "newName"))
  private val deleteEv = ev("d", Row("e001", "empName"), null)
  private val readEv = ev("r", null, Row("e999", "snap"))

  test("single-op insert: after-image columns, metadata attached") {
    val out = ChangeEnvelope.flatten(envelope(Seq(insertEv, updateEv, readEv)), rowSchema, "insert")
    assert(out.columns.toSeq === Seq("id", "name", "_op", "_source_ts_ms", "_ts_ms"))
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows.head === Row("e001", "empName", "insert", 100L, 200L))
  }

  test("single-op delete: before_ prefixed columns") {
    val out = ChangeEnvelope.flatten(envelope(Seq(deleteEv, insertEv)), rowSchema, "delete")
    assert(out.columns.toSeq === Seq("before_id", "before_name", "_op", "_source_ts_ms", "_ts_ms"))
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "e001" && rows.head.getString(1) === "empName")
  }

  test("single-op update: interleaved [before_id, id, before_name, name] ordering") {
    val out = ChangeEnvelope.flatten(envelope(Seq(updateEv)), rowSchema, "update")
    assert(out.columns.take(4).toSeq === Seq("before_id", "id", "before_name", "name"))
    // reference expected payload {"e001","e001","empName","newName"}
    val r = out.collect().head
    assert((r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ===
      (("e001", "e001", "empName", "newName")))
  }

  test("multi-op: default padding of absent images; snapshot reads dropped") {
    val out = ChangeEnvelope.flatten(
      envelope(Seq(insertEv, updateEv, deleteEv, readEv)), rowSchema, "insert,update,delete")
    val rows = out.orderBy("_op").collect()
    assert(rows.length === 3) // 'r' dropped
    val byOp = rows.map(r => r.getString(r.fieldIndex("_op")) -> r).toMap
    // insert: before padded with "" (string default)
    assert(byOp("insert").getString(0) === "" && byOp("insert").getString(1) === "e001")
    // delete: after padded with ""
    assert(byOp("delete").getString(0) === "e001" &&
      byOp("delete").getString(byOp("delete").fieldIndex("name")) === "")
    // update: both images real
    assert(byOp("update").getString(0) === "e001" &&
      byOp("update").getString(byOp("update").fieldIndex("name")) === "newName")
  }

  test("single-op mode does NOT pad (reference quirk kept): nulls pass through") {
    val weird = ev("c", null, Row("e002", null))
    val out = ChangeEnvelope.flatten(envelope(Seq(weird)), rowSchema, "insert")
    assert(out.collect().head.isNullAt(1)) // name stays null, not ""
  }

  test("defaultLiteral covers the reference's type table") {
    val df = spark.range(1).select(
      ChangeEnvelope.defaultLiteral(StringType).as("s"),
      ChangeEnvelope.defaultLiteral(BooleanType).as("b"),
      ChangeEnvelope.defaultLiteral(DoubleType).as("d"),
      ChangeEnvelope.defaultLiteral(FloatType).as("f"),
      ChangeEnvelope.defaultLiteral(IntegerType).as("i"),
      ChangeEnvelope.defaultLiteral(LongType).as("l"))
    assert(df.collect().head === Row("", false, 0.0, 0.0f, 0, 0L))
  }

  test("normalize: short/byte→int, decimal scale<=0→long, scale>0→double") {
    val schema = StructType(Seq(
      StructField("sh", ShortType), StructField("by", ByteType),
      StructField("d0", DecimalType(10, 0)), StructField("d2", DecimalType(10, 2)),
      StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1.toShort, 2.toByte,
        new java.math.BigDecimal("42"), new java.math.BigDecimal("1.50"), "x"))),
      schema)
    val out = ChangeEnvelope.normalize(df)
    val types = out.schema.fields.map(_.dataType).toSeq
    assert(types === Seq(IntegerType, IntegerType, LongType, DoubleType, StringType))
    assert(out.collect().head === Row(1, 2, 42L, 1.5, "x"))
  }

  test("operationList parses comma lists with whitespace") {
    assert(ChangeEnvelope.operationList(" insert , UPDATE ,delete") ===
      Seq("insert", "update", "delete"))
  }

  test("opFilter keeps only selected operations") {
    val flat = ChangeEnvelope.flatten(
      envelope(Seq(insertEv, updateEv, deleteEv)), rowSchema, "insert,update,delete")
    assert(ChangeEnvelope.opFilter(flat, Seq("insert", "delete")).count() === 2)
  }
}
