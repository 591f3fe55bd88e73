package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("runningBefore matches a sequential fold; stable under repartitioning") {
    // irregular values + non-contiguous order keys
    val rnd = new scala.util.Random(99)
    val rows = (1 to 500).map(i => (i * 7L + rnd.nextInt(3), rnd.nextInt(50).toLong))
      .distinctBy(_._1)
    val df = rows.toDF("k", "v")
    val got = PrefixSum.runningBefore(df, "k", "v", "off", partitions = 4)
      .select("k", "off").as[(Long, Long)].collect().toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, v) =>
      assert(got(k) === acc, s"key $k")
      acc += v
    }
    // the decomposition actually split the order into multiple blocks
    assert(SequenceGaps.equiCountBounds(
      df.select(col("k").as("id")), 4).nonEmpty)
    // same result at any input partitioning
    val re = PrefixSum.runningBefore(df.repartition(13), "k", "v", "off", partitions = 4)
      .select("k", "off").as[(Long, Long)].collect().toMap
    assert(re === got)
  }

  test("runningBefore: corpus window is block-partitioned, never global") {
    val df = (1L to 100L).map(i => (i, 1L)).toDF("k", "v")
    val plan = PrefixSum.runningBefore(df, "k", "v", "off", partitions = 4)
      .queryExecution.executedPlan.toString
    // every Window node over the input must carry the block partition key;
    // the only permissible unpartitioned window is the block-total fold
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    assert(windows.exists(_.contains("_blk")), plan)
  }

  test("runningBefore: string order keys order numerically, not lexically") {
    // "10" < "9" lexically — if the window or block-id ever sees the raw
    // string column, key 10's offset would be computed before key 9's
    val df = (1L to 120L).map(i => (i.toString, 1L)).toDF("k", "v")
    val got = PrefixSum.runningBefore(df, "k", "v", "off", partitions = 4)
      .select("k", "off").as[(String, Long)].collect().toMap
    (1L to 120L).foreach { i =>
      assert(got(i.toString) === i - 1, s"key $i")
    }
  }

  test("runningBefore on empty input returns empty with the column added") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    val out = PrefixSum.runningBefore(df, "k", "v", "off")
    assert(out.columns.toSeq === Seq("k", "v", "off"))
    assert(out.count() === 0)
  }
}
