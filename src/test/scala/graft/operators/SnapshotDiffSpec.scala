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
      Seq("id", "s", "v", "before_s", "before_v", "_op"))
    val rows = out.select("id", "_op", "s", "before_s")
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(rows === Seq(
      (1L, "delete", None, Some("a")),
      (3L, "update", Some("c2"), Some("c")),
      (4L, "update", Some("d"), None),
      (5L, "insert", Some("e"), None)))
    // delete keeps the before image and null-pads the after image (O6
    // padding convention), insert the reverse
    val del = out.where(col("_op") === "delete").select("v", "before_v")
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

  test("diff output feeds JdbcApply unchanged: a binlog-free replication round-trip") {
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:/tmp/graft-derby/sdiff_rt;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE TGT") catch { case _: Exception => }
      conn.createStatement().execute("CREATE TABLE TGT (ID INT, NAME VARCHAR(32), V DOUBLE)")
      conn.createStatement().execute(
        "INSERT INTO TGT VALUES (1,'a',1.0), (2,'b',2.0), (3,'c',3.0)")
      // the target mirrors the previous snapshot; the source has since
      // updated 2, deleted 3, inserted 4
      val prev = Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)).toDF("id", "name", "v")
      val now = Seq((1, "a", 1.0), (2, "B", 9.0), (4, "d", 4.0)).toDF("id", "name", "v")
      val diff = SnapshotDiff.diff(prev, now, Seq("id"))
      graft.streaming.JdbcApply(
        graft.sources.Jdbc.ConnectionSpec(url.stripSuffix(";create=true"), Map.empty),
        "TGT", Seq("id"))(diff, 0L)
      val rs = conn.createStatement().executeQuery("SELECT ID, NAME, V FROM TGT ORDER BY ID")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
      assert(got === Seq((1, "a", 1.0), (2, "B", 9.0), (4, "d", 4.0)))
    } finally conn.close()
  }

  test("diffPruned equals diff, and a localized change dirties few buckets") {
    val before = (1L to 2000L).map(i => (i, s"name_$i", i * 10)).toDF("id", "s", "v")
    // one update, one delete, one insert — everything else untouched
    val after = ((1L to 2000L).filter(_ != 1700L).map { i =>
      (i, s"name_$i", if (i == 300L) -1L else i * 10)
    } :+ (9999L, "new", 0L)).toDF("id", "s", "v")
    val full = SnapshotDiff.diff(before, after, Seq("id"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val pruned = SnapshotDiff.diffPruned(before, after, Seq("id"), buckets = 256)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(full === pruned)
    assert(full.size === 3)
    // 3 changed keys -> at most 3 dirty buckets of 256; unchanged buckets
    // are proven clean by digest and never enter the PK join
    def digests(df: org.apache.spark.sql.DataFrame) =
      SnapshotDiff.bucketDigests(df, Seq("id"), 256)
    val dirty = SnapshotDiff.dirtyBuckets(digests(before), digests(after)).count()
    assert(dirty >= 1 && dirty <= 3, s"expected <=3 dirty buckets, got $dirty")
    // the capture-loop shape: last round's PERSISTED digests, one scan of
    // the new snapshot — identical change set
    val incr = SnapshotDiff.diffPrunedIncremental(
        before, digests(before).localCheckpoint(), after, Seq("id"), 256)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(incr === full)
    // unchanged snapshots: zero dirty buckets, empty diff
    assert(SnapshotDiff.dirtyBuckets(digests(before), digests(before)).isEmpty)
    assert(SnapshotDiff.diffPruned(before, before, Seq("id"), 256).isEmpty)
  }

  test("identical snapshots diff to empty; fully disjoint ones to inserts + deletes") {
    val x = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(SnapshotDiff.diff(x, x, Seq("id")).isEmpty)
    val y = Seq((3L, "c")).toDF("id", "s")
    val ops = SnapshotDiff.diff(x, y, Seq("id"))
      .groupBy("_op").count().as[(String, Long)].collect().toMap
    assert(ops === Map("insert" -> 1L, "delete" -> 2L))
  }
}
