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
