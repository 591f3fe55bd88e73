package graft.tools

/** Dev diagnostic: print the executed plan of one contract query
  * (`runMain graft.tools.PlanDump q1_op_filter [sfDir]`). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val name = args.headOption.getOrElse("q1_op_filter")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(s"==== $name ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
