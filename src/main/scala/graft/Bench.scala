package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query at SPARK_GRAFT_SF_DIR, one JSON
  * line. Queries execute into the `noop` sink so every projected column
  * is actually computed (a bare `count()` lets Catalyst prune the very
  * expressions under test). A warm-up pass at sf0.001 absorbs JVM/codegen
  * startup so per-query numbers reflect steady state.
  *
  * Each query reports the MEDIAN of 3 samples taken on INTERLEAVED
  * whole-suite passes (run all queries, then run them all again, ...):
  * back-to-back median-of-3 puts a query's three samples inside one
  * contention window, so a minutes-long noisy neighbor poisons all of
  * them at once (the round-4 27× spike and the round-5 p18/q14/p26
  * artifacts — all on unchanged code); with a suite-length gap between
  * samples, one bad window can hit at most one sample per query and the
  * median discards it. Cache cleared between runs.
  *
  * Round-8 contention defenses (the round-7 artifact was poisoned for
  * FOUR adjacent-in-run-order queries across ALL THREE passes — a
  * contention window longer than a pass, which the interleaved median
  * cannot absorb and the harness could not even detect):
  *   - SENTINEL: a fixed-cost machine-health probe (sum of xxhash64 over
  *     a 400M-row range — constant work, no I/O, no code under test)
  *     timed at the start of every pass and emitted as `"sentinel":[...]`
  *     in the JSON; a pass whose sentinel exceeds 2.5x the best pass's is
  *     named in `"contended_passes"` so a reader can tell "machine was
  *     busy" from "engine got slower".
  *   - ROTATION: each pass visits the queries at a rotated starting
  *     offset, so a query's neighborhood differs per pass and a
  *     stationary noisy window cannot hit the same queries in every
  *     sample (exactly the round-7 failure geometry).
  *   - PRIOR-ROUND DELTA: the committed previous BENCH_r*.json (or
  *     SPARK_GRAFT_BENCH_PRIOR) is compared per query; medians deviating
  *     >3x either way are listed in `"deviant_vs_prior"` — on unchanged
  *     code that flag means "re-run before committing", per the round-7
  *     verdict.
  *   - [[graft.functions.Dedup.releaseCcLabels]] between queries, so CC
  *     checkpoint blocks from one timed query never occupy executor
  *     storage during later ones. */
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
    // fixed-cost health probe: pure codegen arithmetic over an in-memory
    // range — measures the MACHINE (cpu contention, gc pressure), never
    // the code under test
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("sum(xxhash64(id)) AS s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    sentinel() // JIT the probe itself before any timed use
    names.foreach(execOnce(_, "/root/testdata/sf0.001")) // warm-up
    spark.catalog.clearCache() // drop warm-up caches: measure steady state
    graft.functions.Dedup.releaseCcLabels()
    val sentinels = new scala.collection.mutable.ArrayBuffer[Double]
    val samples: Seq[Map[String, Double]] = (0 until runs).map { pass =>
      sentinels += sentinel()
      // rotate the visit order per pass: a stationary contention window
      // then hits a different neighborhood each sample
      val rotated = names.drop(pass * names.size / runs) ++
        names.take(pass * names.size / runs)
      rotated.map { n =>
        val t = execOnce(n, sfDir)
        spark.catalog.clearCache() // operator caches must not leak across runs
        graft.functions.Dedup.releaseCcLabels()
        n -> t
      }.toMap
    }
    // per-query median ACROSS suite passes; any failed sample poisons the query
    val results = names.map { n =>
      val ts = samples.map(_(n))
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(runs / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures carry a -1 sentinel per query; keep them OUT of the total
    // (a failing run must never report a better aggregate than a clean one)
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => k }
    if (failed.nonEmpty) System.err.println(s"[bench] FAILED: ${failed.mkString(",")}")
    val bestSentinel = sentinels.min
    val contended = sentinels.zipWithIndex.collect {
      case (s, i) if s > 2.5 * bestSentinel => i
    }
    val prior = priorRound()
    val deviant = prior.toSeq.flatMap { case (_, pq) =>
      results.collect {
        case (n, v) if v > 0 && pq.getOrElse(n, -1.0) > 0.05 &&
          (v / pq(n) > 3.0 || pq(n) / v > 3.0) =>
          "\"" + n + "\":" + f"${v / pq(n)}%.2f"
      }
    }
    val sentJson = sentinels.map(s => f"$s%.3f").mkString("[", ",", "]")
    val flags =
      s""""sentinel":$sentJson,"contended_passes":${contended.mkString("[", ",", "]")},""" +
        s""""prior":${prior.map(p => "\"" + p._1 + "\"").getOrElse("null")},""" +
        s""""deviant_vs_prior":${deviant.mkString("{", ",", "}")}"""
    if (contended.nonEmpty)
      System.err.println(s"[bench] CONTENDED passes ${contended.mkString(",")}: " +
        s"sentinels ${sentJson} — treat this artifact as suspect and re-run")
    if (deviant.nonEmpty)
      System.err.println(s"[bench] DEVIANT >3x vs prior round: ${deviant.mkString(",")}" +
        " — on unchanged code, re-run before committing")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$flags}""")
    spark.stop()
  }

  /** The latest committed BENCH_r*.json (or SPARK_GRAFT_BENCH_PRIOR): the
    * per-query baseline for the >3x deviation flag. Parsed with a regex —
    * the artifact is the one JSON line this very main emits. */
  private def priorRound(): Option[(String, Map[String, Double])] = {
    val explicit = sys.env.get("SPARK_GRAFT_BENCH_PRIOR").map(new java.io.File(_))
    val candidate = explicit.orElse {
      val dirs = Seq(new java.io.File("."), new java.io.File("/root/repo"))
      dirs.flatMap(d => Option(d.listFiles()).toSeq.flatten)
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
        .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
        .lastOption
    }
    candidate.filter(_.isFile).flatMap { f =>
      try {
        val txt = scala.io.Source.fromFile(f)
        val line = try txt.mkString finally txt.close()
        val start = line.indexOf("\"queries\":{")
        if (start < 0) None else {
          val body = line.substring(start + 11, line.indexOf("}", start))
          val pairs = "\"([A-Za-z0-9_]+)\":(-?[0-9.eE+]+)".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          Some(f.getName -> pairs)
        }
      } catch { case _: Exception => None }
    }
  }
}
