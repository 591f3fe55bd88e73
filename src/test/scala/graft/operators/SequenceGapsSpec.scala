package graft.operators

import graft.SparkSpec

/** Distributed gap detection vs the naive global-window formulation. */
class SequenceGapsSpec extends SparkSpec {
  import spark.implicits._

  private def gapsOf(ids: Seq[Long], parts: Int = 4): Set[(Long, Long)] =
    SequenceGaps.detect(ids.toDF("event_id"), "event_id", parts)
      .as[(Long, Long)].collect().toSet

  test("simple holes") {
    assert(gapsOf(Seq(1, 2, 4, 7)) === Set((3L, 3L), (5L, 6L)))
  }

  test("no gaps") {
    assert(gapsOf(Seq(5, 6, 7, 8)) === Set.empty)
  }

  test("single element / empty") {
    assert(gapsOf(Seq(42)) === Set.empty)
    assert(gapsOf(Seq.empty[Long]) === Set.empty)
  }

  test("gaps across partition seams (more partitions than values)") {
    assert(gapsOf(Seq(1, 10, 20, 21), parts = 8) === Set((2L, 9L), (11L, 19L)))
  }

  test("skewed id range: one outlier id must not collapse blocks (histogram bounds)") {
    // 1..4000 dense plus one id near 2^50: equal-width blocks would put
    // everything in block 0; count-balanced bounds keep the split even
    val ids = (1L to 4000L) :+ (1L << 50)
    val got = gapsOf(ids, parts = 8)
    assert(got === Set((4001L, (1L << 50) - 1)))
    // and with interior holes under the same skew
    val holey = ids.filterNot(i => i % 1000 == 500)
    val expectHoles = (1L to 4000L).filter(_ % 1000 == 500).map(i => (i, i)).toSet
    assert(gapsOf(holey, parts = 8) === expectHoles + ((4001L, (1L << 50) - 1)))
  }

  test("ids spanning more than half the Long range (span overflow)") {
    // hi - lo wraps negative here; the BigInt span keeps microWidth sane
    // (bounded histogram) and `!= 1` keeps gap detection exact when the
    // per-pair difference itself exceeds Long.MaxValue
    val a = Long.MinValue + 2
    val b = Long.MaxValue - 2
    assert(gapsOf(Seq(a, a + 1, b - 1, b), parts = 4) ===
      Set((a + 2, b - 2)))
    assert(gapsOf(Seq(a, a + 1, a + 2), parts = 4) === Set.empty)
    // dense run at each extreme plus interior holes
    val ids = (0L until 100L).map(a + _).filterNot(_ == a + 50) ++
      (0L until 100L).map(b - _).filterNot(_ == b - 50)
    assert(gapsOf(ids, parts = 8) ===
      Set((a + 50, a + 50), (b - 50, b - 50), (a + 100, b - 100)))
  }

  test("matches the naive global-window formulation on real data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = graft.Tables.events(spark, sf()).filter(col("event_type") === "purchase")
    val w = Window.orderBy("event_id")
    val naive = e.select(col("event_id"), lead(col("event_id"), 1).over(w).as("n"))
      .where(col("n") - col("event_id") > 1)
      .select((col("event_id") + 1).as("f"), (col("n") - 1).as("t"))
      .as[(Long, Long)].collect().toSet
    val dist = SequenceGaps.detect(e, "event_id").as[(Long, Long)].collect().toSet
    assert(dist === naive)
    assert(dist.nonEmpty)
  }
}
