package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Attribution probe for the BENCH_r09 p42_line_dedup outlier (13.28 s
  * driver vs 2.69 s local): break p42 into its stages and time each in a
  * fresh-JVM-comparable way so the committed number's mechanism is
  * measurable, not guessed.
  *
  *   reline      — the FIXTURE transform alone (normText+words+re-line)
  *   p42_full    — the committed query (reline paid twice: stats + rewrite)
  *   materialize — write the relined fixture to parquet once
  *   p42_parquet — lineDedup over the materialized fixture (operator only)
  *   stats_only  — lineStats over the materialized fixture
  *   rewrite_only— lineDedupAgainst given precomputed stats
  *
  * `runMain graft.tools.ProfileP42 [sfDir] [reps]`
  */
object ProfileP42 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Unit): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[p42] $name%-14s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up on tiny sf
    SparkEntry.queries("p42_line_dedup")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    val relined = PipelineQueries.relinedFixtureRaw(spark, dir)
    time("reline")(noop(relined))
    time("p42_full")(noop(
      functions.Dedup.lineDedup(relined, minDocs = 2).orderBy("doc_id")))

    val tmp = java.nio.file.Files.createTempDirectory("p42prof").toString
    val matPath = s"$tmp/relined"
    val t0 = System.nanoTime()
    relined.write.mode("overwrite").parquet(matPath)
    println(f"[p42] materialize          ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    val mat = spark.read.parquet(matPath)
    time("p42_parquet")(noop(
      functions.Dedup.lineDedup(mat, minDocs = 2).orderBy("doc_id")))
    time("stats_only")(noop(functions.Dedup.lineStats(mat)))
    val stats = functions.Dedup.lineStats(mat)
    stats.write.mode("overwrite").parquet(s"$tmp/stats")
    val statsP = spark.read.parquet(s"$tmp/stats")
    time("rewrite_only")(noop(
      functions.Dedup.lineDedupAgainst(mat, statsP, minDocs = 2).orderBy("doc_id")))
    spark.stop()
  }
}
