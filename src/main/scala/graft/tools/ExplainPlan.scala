package graft.tools

import graft._

/** Dump the executed plan of one SparkEntry query (dev diagnostics):
  * `runMain graft.tools.ExplainPlan p6_dedup_ngram [sfDir]`. */
object ExplainPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p6_dedup_ngram")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.create("8")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
