package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Exact discrete per-group quantiles via the value-histogram
  * formulation ([[Distribution.groupedDiscreteQuantiles]]). */
class DistributionSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: k-th smallest with k = ceil(q*n), ties and duplicates included") {
    val df = Seq(
      // g1: values 1,2,2,3 -> n=4, p50 = 2nd smallest = 2, p90 = ceil(3.6)=4th = 3
      ("g1", 3L), ("g1", 2L), ("g1", 1L), ("g1", 2L),
      // g2: single value -> every quantile is that value
      ("g2", 7L),
    ).toDF("g", "v")
    val out = Distribution.groupedDiscreteQuantiles(df, "g", "v",
      Seq(("p50", 1, 2), ("p90", 9, 10))).orderBy("g").collect().toSeq
    assert(out === Seq(
      Row("g1", 4L, 8L, 2L, 3L),
      Row("g2", 1L, 7L, 7L, 7L)))
  }

  test("matches a sort-based oracle on random data for several quantiles") {
    val rnd = new scala.util.Random(909)
    val data = (1 to 3000).map(_ => (s"g${rnd.nextInt(7)}", rnd.nextInt(40).toLong))
    val qs = Seq(("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
      ("p99", 99, 100), ("p100", 1, 1))
    val got = Distribution.groupedDiscreteQuantiles(data.toDF("g", "v"), "g", "v", qs)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val exp = data.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def kth(num: Int, den: Int): Long = sorted((num * n + den - 1) / den - 1)
      g -> (Seq(n.toLong, sorted.sum) ++ qs.map { case (_, nu, de) => kth(nu, de) })
    }
    assert(exp.nonEmpty && got === exp)
  }

  test("plan: counting happens map-side; the windows run over histogram cells") {
    val df = (1 to 500).map(i => (s"g${i % 3}", (i % 20).toLong)).toDF("g", "v")
    val out = Distribution.groupedDiscreteQuantiles(df, "g", "v", Seq(("p50", 1, 2)))
    val plan = out.queryExecution.executedPlan.toString
    // partial aggregation before the first exchange: rows collapse to
    // (group, value) cells on the map side
    assert(plan.contains("partial_count"), plan)
    // and nothing funnels through a single partition
    assert(!plan.contains("SinglePartition"), plan)
    assert(out.count() === 3)
  }
}
