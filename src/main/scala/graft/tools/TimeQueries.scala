package graft.tools

import graft._

/** Time a subset of SparkEntry queries (dev diagnostics):
  * `runMain graft.tools.TimeQueries sfDir q1 q2 ...`
  * (`all` as the single query name = every registered query);
  * `SPARK_GRAFT_TQ_REPS` (default 1) reports the min of N reps. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1 && args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.tail.toSeq
      else Seq("p6_dedup_ngram", "p7_dedup_minhash")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TQ_REPS", "1").toInt
    val spark = GraftSession.create("32")
    names.foreach { n => // warm-up at tiny sf
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    // matched-window A/B: SPARK_GRAFT_TQ_DIR2 alternates a second data
    // dir with the first INSIDE each query's rep loop, so both sides see
    // the same contention window and the min-vs-min is window-robust
    val dir2 = sys.env.get("SPARK_GRAFT_TQ_DIR2")
    names.foreach { n =>
      def one(d: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      dir2 match {
        case Some(d2) =>
          val pairs = (1 to reps).map(_ => (one(dir), one(d2)))
          val (a, b) = (pairs.map(_._1), pairs.map(_._2))
          println(f"[time] $n%-24s A ${a.min}%.2f  B ${b.min}%.2f  dAB ${a.min - b.min}%+.2f  " +
            f"(A ${a.map(t => f"$t%.2f").mkString(",")} | B ${b.map(t => f"$t%.2f").mkString(",")})")
        case None =>
          val ts = (1 to reps).map(_ => one(dir))
          println(f"[time] $n%-24s ${ts.min}%.2f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
