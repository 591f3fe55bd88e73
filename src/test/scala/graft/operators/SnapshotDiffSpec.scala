package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot differencing: op classification, envelope images, null-safe
  * change detection, contract validation. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff emits insert/update/delete with envelope images; unchanged rows omitted") {
    val before = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("b"), 20L),
      (3L, Some("c"), 30L),
      (4L, None: Option[String], 40L)).toDF("id", "s", "v")
    val after = Seq(
      (2L, Some("b"), 20L), // unchanged -> omitted
      (3L, Some("c2"), 30L), // value update
      (4L, Some("d"), 40L), // NULL -> value must count as a change (<=>)
      (5L, Some("e"), 50L)).toDF("id", "s", "v")
    val out = SnapshotDiff.diff(before, after, Seq("id")).orderBy("id")
    assert(out.columns.toSeq ===
      Seq("id", "s", "v", "before_s", "before_v", "op"))
    val rows = out.select("id", "op", "s", "before_s")
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(rows === Seq(
      (1L, "delete", None, Some("a")),
      (3L, "update", Some("c2"), Some("c")),
      (4L, "update", Some("d"), None),
      (5L, "insert", Some("e"), None)))
    // delete keeps the before image and null-pads the after image (O6
    // padding convention), insert the reverse
    val del = out.where(col("op") === "delete").select("v", "before_v")
      .as[(Option[Long], Option[Long])].head()
    assert(del === ((None, Some(10L))))
  }

  test("mismatched schemas and non-schema pk are rejected") {
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq((1L, "x", 2L)).toDF("id", "s", "v")
    intercept[IllegalArgumentException](SnapshotDiff.diff(a, b, Seq("id")))
    intercept[IllegalArgumentException](SnapshotDiff.diff(a, a, Seq("nope")))
    intercept[IllegalArgumentException](SnapshotDiff.diff(a, a, Seq.empty))
  }

  test("identical snapshots diff to empty; fully disjoint ones to inserts + deletes") {
    val x = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(SnapshotDiff.diff(x, x, Seq("id")).isEmpty)
    val y = Seq((3L, "c")).toDF("id", "s")
    val ops = SnapshotDiff.diff(x, y, Seq("id"))
      .groupBy("op").count().as[(String, Long)].collect().toMap
    assert(ops === Map("insert" -> 1L, "delete" -> 2L))
  }
}
