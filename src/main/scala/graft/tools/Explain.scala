package graft.tools

import graft._

/** Dump formatted physical plans for plan-quality review: verifies
  * PushedFilters reach the parquet scan, projections prune ReadSchema,
  * small dims broadcast, and codegen spans cover the hot path. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
