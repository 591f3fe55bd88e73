package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB extended-JSON change-event decode (O10).
  *
  * The reference receives Mongo change events whose `after` / `patch`
  * payloads are extended-JSON *strings* and coerces the `$`-typed wrappers
  * (`listening/MongoChangeDataCapture.java:48-144`):
  *   - `{"$numberLong": "123"}` → long
  *   - `{"$numberDecimal": "1.5"}` → double
  *   - `_id: {"$oid": "..."}` → string column `id`
  *   - any other nested object → its JSON string
  *   - update events decode `patch.$set` and take `id` from the key doc
  *   - delete events carry only `id` from the key doc
  *
  * Spark-first: every rule is a `get_json_object` + `cast` column expression
  * (codegen'd) — no JSON library on the hot path, no UDFs.
  *
  * Divergence kept on purpose (SURVEY §7.4): the reference's Mongo path
  * loses its transport properties to a `List.add` boolean bug
  * (`MongoChangeDataCapture.java:69-74`); we attach real `_op` metadata.
  */
object MongoExtJson {

  /** Extract a typed field from an extended-JSON document string: try the
    * `$numberLong` / `$numberDecimal` wrappers first, fall back to the
    * plain value (objects come back as JSON strings — the reference's
    * `toString` branch). Bracket paths keep `$`-prefixed keys literal. */
  def extField(doc: Column, field: String, dt: DataType): Column = {
    val base = s"$$['$field']"
    val asLong = get_json_object(doc, s"$base['$$numberLong']").cast(LongType)
    val asDec = get_json_object(doc, s"$base['$$numberDecimal']").cast(DoubleType)
    coalesce(asLong.cast(dt), asDec.cast(dt), get_json_object(doc, base).cast(dt))
  }

  /** `_id.$oid` of a document (insert path, `MongoChangeDataCapture.java:136-139`). */
  def oid(doc: Column): Column = get_json_object(doc, "$['_id']['$oid']")

  /** Key-document id (`{"id": "{\"$oid\": ...}"}` — update/delete paths,
    * `MongoChangeDataCapture.java:81-86,96-99`). */
  def keyOid(keyDoc: Column): Column = get_json_object(keyDoc, "$['$oid']")

  /** Decode an insert envelope: `after` JSON doc → typed columns per the
    * declared schema + `id` from `_id.$oid`. */
  def decodeInsert(df: DataFrame, rowSchema: StructType, afterCol: String = "after"): DataFrame = {
    val fields = rowSchema.fields.toSeq.map(f => extField(col(afterCol), f.name, f.dataType).as(f.name))
    df.select(oid(col(afterCol)).as("id") +: fields: _*)
  }

  /** Decode an update envelope: `patch.$set` fields + `id` from the key doc. */
  def decodeUpdate(df: DataFrame, rowSchema: StructType,
                   patchCol: String = "patch", keyCol: String = "key_id"): DataFrame = {
    val setDoc = get_json_object(col(patchCol), "$['$set']")
    val fields = rowSchema.fields.toSeq.map(f => extField(setDoc, f.name, f.dataType).as(f.name))
    df.select(keyOid(col(keyCol)).as("id") +: fields: _*)
  }

  /** Decode a delete envelope: only the key-document id survives. */
  def decodeDelete(df: DataFrame, keyCol: String = "key_id"): DataFrame =
    df.select(keyOid(col(keyCol)).as("id"))
}
