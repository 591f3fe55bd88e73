package graft.tools

import graft._

/** Time a subset of SparkEntry queries (dev diagnostics):
  * `runMain graft.tools.TimeQueries sfDir q1 q2 ...` */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("p6_dedup_ngram", "p7_dedup_minhash")
    val spark = GraftSession.create("32")
    names.foreach { n => // warm-up at tiny sf
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[time] $n%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
