package graft

/** Dev smoke: mirrors the driver's rows>0 check on [[SparkEntry.entry]]. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val df = SparkEntry.entry(spark)
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=${df.count()}")
    spark.stop()
  }
}
