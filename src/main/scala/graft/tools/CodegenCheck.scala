package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Sanity: the custom expressions generate compilable code (a Janino
  * failure would silently fall back to interpreted eval). AQE inserts
  * WholeStageCodegen per stage at runtime, so this checks a non-adaptive
  * minimal plan where the span is static. */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val df = spark.range(5)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"))
      .select(call_function("vec_dot", col("a"), col("a")).as("d"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(gen.contains("vdN"), "vec_dot loop missing from generated code")
    val total = df.agg(sum("d")).collect().head.getDouble(0)
    assert(total == 50.0, s"vec_dot produced wrong sum: $total (expected 50.0)")
    println("[codegen] vec_dot generates, compiles, and computes correctly")
    spark.stop()
  }
}
