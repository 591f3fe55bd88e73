package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.summarize must keep a contention window — even one covering a
  * query's every sample (the r07/r08 poisoning mode) — out of the
  * reported medians, or at least flag the query it could not save. */
class BenchSummarizeSpec extends AnyFunSuite {

  private val aName = SparkEntry.queries.keys.toSeq.sorted.head
  private val bName = SparkEntry.queries.keys.toSeq.sorted.apply(1)

  test("clean-segment samples win the median; contended samples are discarded") {
    // sentinels: best 0.3; the 1.5 segment is >2.5x best -> contended.
    // aName sampled (0.5 clean, 0.4 clean, 9.9 contended): median of
    // {0.5, 0.4} = 0.5, the 9.9 never pollutes.
    val samples = Map(aName -> List((0.5, 0.3), (0.4, 0.31), (9.9, 1.5)))
    val (results, contaminated) = Bench.summarize(samples, Seq(0.3, 0.31, 1.5))
    assert(results.toMap.apply(aName) === 0.5)
    assert(contaminated.isEmpty)
  }

  test("a query with zero clean samples keeps the all-sample median but is flagged") {
    // the floor keys off the MEDIAN sentinel (round 10), so the clean
    // majority of segments sets the baseline and the contended minority
    // that happened to cover every one of aName's samples is discarded
    val samples = Map(
      aName -> List((8.0, 1.5), (9.0, 1.6), (7.0, 1.7)), // every sample contended
      bName -> List((0.2, 0.3)))
    val (results, contaminated) = Bench.summarize(samples,
      Seq(0.3, 0.28, 0.31, 0.3, 1.5, 1.6, 1.7))
    assert(results.toMap.apply(aName) === 8.0) // median of {7,8,9}
    assert(contaminated === Seq(aName))
  }

  test("one lucky-JIT fast sentinel does not flag ordinary segments (median floor)") {
    // observed on an idle box: fresh-JVM probes vary ~4x with JIT luck
    // (0.11 vs 0.3-0.43); a min-keyed floor flagged 15/33 clean segments
    val samples = Map(aName -> List((0.5, 0.4), (0.45, 0.11), (0.48, 0.43)))
    val (results, contaminated) = Bench.summarize(samples,
      Seq(0.4, 0.11, 0.43, 0.3, 0.35, 0.28))
    assert(results.toMap.apply(aName) === 0.48) // all three samples clean
    assert(contaminated.isEmpty)
  }

  test("a failed sample (-1) poisons the query regardless of segments") {
    val samples = Map(aName -> List((0.5, 0.3), (-1.0, 0.3)))
    val (results, _) = Bench.summarize(samples, Seq(0.3, 0.3))
    assert(results.toMap.apply(aName) === -1.0)
  }

  test("a query that never ran reports -1, not an exception") {
    val (results, _) = Bench.summarize(Map.empty, Seq(0.3))
    assert(results.toMap.apply(aName) === -1.0)
    assert(results.size === SparkEntry.queries.size)
  }
}
