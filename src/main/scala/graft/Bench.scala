package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query at SPARK_GRAFT_SF_DIR, one JSON
  * line. Queries execute into the `noop` sink so every projected column
  * is actually computed (a bare `count()` lets Catalyst prune the very
  * expressions under test). A warm-up pass at sf0.001 absorbs JVM/codegen
  * startup so per-query numbers reflect steady state.
  *
  * Each query reports the MEDIAN of 3 runs (cache cleared between runs):
  * a single sample on a contended box once reported a 27× spike on an
  * unchanged 2 MB-scan query (round-4 bench artifact); the median shrugs
  * off one bad sample while still charging real regressions. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def execOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    /** Median of `runs` samples; any failed sample poisons the query. */
    def exec(name: String, dir: String): Double = {
      val ts = (1 to runs).map { _ =>
        val t = execOnce(name, dir)
        spark.catalog.clearCache() // operator caches must not leak across runs
        t
      }
      if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(runs / 2)
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(execOnce(_, "/root/testdata/sf0.001")) // warm-up
    spark.catalog.clearCache() // drop warm-up caches: measure steady state
    val results = names.map(n => n -> exec(n, sfDir))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures carry a -1 sentinel per query; keep them OUT of the total
    // (a failing run must never report a better aggregate than a clean one)
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => k }
    if (failed.nonEmpty) System.err.println(s"[bench] FAILED: ${failed.mkString(",")}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
