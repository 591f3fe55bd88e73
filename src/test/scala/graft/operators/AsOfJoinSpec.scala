package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: inclusive at-or-before match per key, null state
  * survival, no-match → null, and the single-shuffle plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def right =
    Seq((1L, 10L, "v10", Some(1.0)), (1L, 20L, "v20", None),
      (2L, 5L, "w5", Some(2.0)))
      .toDF("k", "t", "s", "x")

  private def left =
    Seq((1L, 9L, 100L), (1L, 10L, 101L), (1L, 15L, 102L), (1L, 25L, 103L),
      (2L, 5L, 104L), (3L, 50L, 105L))
      .toDF("k", "t", "id")

  test("matches the greatest right ts <= left ts, inclusive; no match -> null") {
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("s", "x"))
      .orderBy("id")
      .select("id", "s", "x")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq === Seq(
      (100L, None, None),            // before any state
      (101L, Some("v10"), Some(1.0)), // exactly at state ts (inclusive)
      (102L, Some("v10"), Some(1.0)), // between versions -> earlier one
      (103L, Some("v20"), None),      // null FIELD of the newest version survives
      (104L, Some("w5"), Some(2.0)),  // other key, exact-ts match
      (105L, None, None)))            // key with no right side at all
  }

  test("left columns pass through unchanged") {
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("s"))
    assert(out.columns.toSeq === Seq("k", "t", "id", "s"))
    assert(out.count() === left.count())
  }

  test("state-column collision with left is rejected") {
    val clash = right.withColumnRenamed("s", "id")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, clash, "k", "t", Seq("id"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("plan shape: one hash exchange on the key, no join node") {
    val p = AsOfJoin.asOf(left, right, "k", "t", Seq("s"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    val hashEx = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(hashEx.size === 1, s"expected exactly one keyed exchange:\n$p")
  }

  test("agrees with the naive per-row max formulation on random data") {
    val n = 500
    val rnd = new scala.util.Random(42)
    val lft = Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "id")
    val rgt = Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct // unique (k, t) precondition
      .map { case (k, t) => (k, t, s"s$k-$t") }
      .toDF("k", "t", "s")
    val got = AsOfJoin.asOf(lft, rgt, "k", "t", Seq("s"))
      .select("id", "s").as[(Long, Option[String])].collect().toMap
    // oracle: theta-join + row_number (exactly what asOf avoids at scale)
    val naive = lft.as("l").join(rgt.as("r"),
        col("l.k") === col("r.k") && col("l.t") >= col("r.t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("r.t").desc)))
      .filter(col("rn") === 1)
      .select(col("id"), col("r.s")).as[(Long, Option[String])].collect().toMap
    lft.select("id").as[Long].collect().foreach { id =>
      assert(got(id) === naive.getOrElse(id, None), s"id=$id")
    }
  }
}
