package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Mongo extended-JSON decode (O10) — coercion rules of
  * MongoChangeDataCapture.java:109-144. */
class MongoExtJsonSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("amount", LongType),
    StructField("price", DoubleType),
    StructField("name", StringType)))

  test("insert decode: $oid id, $numberLong, $numberDecimal, plain string") {
    val doc =
      """{"_id": {"$oid": "5f1a2b3c4d5e6f7a8b9c0d1e"},
        |"amount": {"$numberLong": "123"},
        |"price": {"$numberDecimal": "1.5"},
        |"name": "widget"}""".stripMargin.replaceAll("\n", "")
    val df = Seq(doc).toDF("after")
    val out = MongoExtJson.decodeInsert(df, rowSchema)
    assert(out.columns.toSeq === Seq("id", "amount", "price", "name"))
    assert(out.collect().head === Row("5f1a2b3c4d5e6f7a8b9c0d1e", 123L, 1.5, "widget"))
  }

  test("plain (non-wrapped) numerics decode too") {
    val doc = """{"_id": {"$oid": "aa"}, "amount": 7, "price": 2.25, "name": "x"}"""
    val out = MongoExtJson.decodeInsert(Seq(doc).toDF("after"), rowSchema)
    assert(out.collect().head === Row("aa", 7L, 2.25, "x"))
  }

  test("STREAMING Mongo round-trip: insert/update/delete decode over a live micro-batch " +
      "stream (reference TestCaseOfCDCListeningModeMongo.java:71-334 shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx = spark.sqlContext
    // (op, after, patch, key_id) — the Debezium-Mongo value shapes
    val in = MemoryStream[(String, String, String, String)]
    val src = in.toDF().toDF("op", "after", "patch", "key_id")
    val inserts = MongoExtJson.decodeInsert(src.where($"op" === "c"), rowSchema)
      .withColumn("_op", org.apache.spark.sql.functions.lit("insert"))
    val updates = MongoExtJson.decodeUpdate(src.where($"op" === "u"), rowSchema)
      .withColumn("_op", org.apache.spark.sql.functions.lit("update"))
    val deletes = MongoExtJson.decodeDelete(src.where($"op" === "d"))
      .select($"id", org.apache.spark.sql.functions.lit(null).cast(LongType).as("amount"),
        org.apache.spark.sql.functions.lit(null).cast(DoubleType).as("price"),
        org.apache.spark.sql.functions.lit(null).cast(StringType).as("name"),
        org.apache.spark.sql.functions.lit("delete").as("_op"))
    val q = inserts.unionByName(updates).unionByName(deletes)
      .writeStream.format("memory").queryName("mongo_rt")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        ("c", """{"_id": {"$oid": "e001"}, "amount": {"$numberLong": "5"}, "price": 1.5, "name": "empName"}""", null, null),
        ("u", null, """{"$set": {"amount": {"$numberLong": "6"}, "price": {"$numberDecimal": "2.5"}, "name": "newName"}}""", """{"$oid": "e001"}"""),
        ("d", null, null, """{"$oid": "e001"}"""))
      q.processAllAvailable()
      val got = spark.table("mongo_rt").collect().map(_.toSeq).toSet
      assert(got === Set(
        Seq("e001", 5L, 1.5, "empName", "insert"),
        Seq("e001", 6L, 2.5, "newName", "update"),
        Seq("e001", null, null, null, "delete")))
    } finally q.stop()
  }

  test("update decode: patch.$set fields + key-doc id") {
    val patch = """{"$set": {"amount": {"$numberLong": "9"}, "price": 3.5, "name": "renamed"}}"""
    val key = """{"$oid": "bb"}"""
    val df = Seq((patch, key)).toDF("patch", "key_id")
    val out = MongoExtJson.decodeUpdate(df, rowSchema)
    assert(out.collect().head === Row("bb", 9L, 3.5, "renamed"))
  }

  test("delete decode: only key id") {
    val out = MongoExtJson.decodeDelete(Seq("""{"$oid": "cc"}""").toDF("key_id"))
    assert(out.columns.toSeq === Seq("id"))
    assert(out.collect().head === Row("cc"))
  }

  test("nested object falls back to JSON string (reference toString branch)") {
    val schema = StructType(Seq(StructField("meta", StringType)))
    val doc = """{"_id": {"$oid": "dd"}, "meta": {"a": 1, "b": "x"}}"""
    val out = MongoExtJson.decodeInsert(Seq(doc).toDF("after"), schema)
    val meta = out.collect().head.getString(1)
    assert(meta.contains("\"a\"") && meta.contains("1"))
  }
}
