package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.core.MongoExtJson
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Mongo listening-mode round-trips via envelope replay — the Spark
  * analog of TestCaseOfCDCListeningModeMongo.java:71-334: the Debezium
  * Mongo envelope carries extended-JSON STRINGS (`after`, `patch`) plus a
  * key document; decode rules in [[graft.core.MongoExtJson]]. */
class MongoListeningSpec extends SparkSpec {

  // SweetProductionTable schema (ref :50,86-89): name/amount/volume
  private val rowSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("amount", DoubleType),
    StructField("volume", LongType)))

  private val envSchema = StructType(Seq(
    StructField("op", StringType),
    StructField("after", StringType),
    StructField("patch", StringType),
    StructField("key_id", StringType)))

  private def replay(lines: Seq[String]): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("mongo_env").toString
    Files.writeString(Paths.get(dir, "batch.json"), lines.mkString("\n"))
    spark.readStream.schema(envSchema).json(dir)
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, sink: String): Unit = {
    val q = df.writeStream.format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("Mongo insert: extended-JSON after doc -> typed columns + oid id") {
    val after =
      """{\"_id\": {\"$oid\": \"5f1a\"}, \"name\": \"jam\",
        | \"amount\": {\"$numberDecimal\": \"12.5\"},
        | \"volume\": {\"$numberLong\": \"7\"}}""".stripMargin.replaceAll("\n", "")
    val env = s"""{"op":"c","after":"$after","patch":null,"key_id":null}"""
    val flat = MongoExtJson.decodeInsert(
      replay(Seq(env)).where(col("op") === "c"), rowSchema)
    runToMemory(flat, "mongo_ins")
    val r = spark.table("mongo_ins").collect().head
    assert(r.getString(0) === "5f1a")
    assert(r.getString(1) === "jam" && r.getDouble(2) === 12.5 && r.getLong(3) === 7L)
  }

  test("Mongo update: patch.$set fields + key-doc id") {
    val patch = """{\"$set\": {\"amount\": 20.0}}"""
    val key = """{\"$oid\": \"5f1a\"}"""
    val env = s"""{"op":"u","after":null,"patch":"$patch","key_id":"$key"}"""
    val schema = StructType(Seq(StructField("amount", DoubleType)))
    val flat = MongoExtJson.decodeUpdate(
      replay(Seq(env)).where(col("op") === "u"), schema)
    runToMemory(flat, "mongo_upd")
    val r = spark.table("mongo_upd").collect().head
    assert(r.getString(0) === "5f1a" && r.getDouble(1) === 20.0)
  }

  test("Mongo delete: only the key id survives; transport props NOT lost (divergence)") {
    val key = """{\"$oid\": \"5f1a\"}"""
    val env = s"""{"op":"d","after":null,"patch":null,"key_id":"$key"}"""
    // divergence from MongoChangeDataCapture.java:69-74 (List.add bug
    // loses transport props): we keep _op alongside the decoded key
    val src = replay(Seq(env)).where(col("op") === "d")
    val flat = MongoExtJson.decodeDelete(src).withColumn("_op", lit("delete"))
    runToMemory(flat, "mongo_del")
    val r = spark.table("mongo_del").collect().head
    assert(r.getString(0) === "5f1a" && r.getString(1) === "delete")
  }
}
