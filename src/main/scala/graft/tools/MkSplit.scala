package graft.tools

import graft._

/** Dev measurement device (round 16): write an n-file copy of a test
  * data dir so scan stages get n-way parallelism, to A/B how much of a
  * query's cost is the single-row-group single-task scan bottleneck.
  * Never part of any query path — the copy lives under /tmp and is a
  * profiling fixture only. */
object MkSplit {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf0.1split"
    val n = if (args.length > 2) args(2).toInt else 32
    val spark = GraftSession.create("32")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").repartition(n)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    spark.stop()
  }
}
