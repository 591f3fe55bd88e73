package graft.tools

/** Dev diagnostic: print the confs and parquet schema the bench JVM
  * actually sees (used to chase the bare-java vs sbt-forked
  * nanosAsLong discrepancy; not part of the library surface). */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    println("nanosAsLong=" + spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong"))
    println("inferTimestampNTZ=" + spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled"))
    println("extensions=" + spark.conf.getOption("spark.sql.extensions"))
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    println("events schema: " + raw.schema.simpleString)
    spark.stop()
  }
}
