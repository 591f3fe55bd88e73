package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query at SPARK_GRAFT_SF_DIR, one JSON
  * line. Queries execute into the `noop` sink so every projected column
  * is actually computed (a bare `count()` lets Catalyst prune the very
  * expressions under test). A warm-up pass at sf0.001 absorbs JVM/codegen
  * startup so per-query numbers reflect steady state.
  *
  * Each query reports the MEDIAN of 3 samples taken on whole-suite
  * passes (run all queries, then run them all again, ...): back-to-back
  * median-of-3 puts a query's three samples inside one contention
  * window, so a minutes-long noisy neighbor poisons all of them at once
  * (the round-4 27× spike and the round-5 p18/q14/p26 artifacts — all on
  * unchanged code); with a suite-length gap between samples, one bad
  * window can hit at most one sample per query and the median discards
  * it. Cache cleared between runs.
  *
  * Round-8 defenses (the round-7 artifact was poisoned for FOUR
  * adjacent-in-run-order queries across ALL THREE passes — a window
  * longer than a pass, which the interleaved median cannot absorb and
  * the harness could not even detect):
  *   - PROCESS-PER-PASS (the big one): each pass runs in its own child
  *     JVM (`SPARK_GRAFT_BENCH_FORK=0` opts out). An in-process pass
  *     loop contaminates late samples of every pass with accumulated
  *     executor state — shuffle-file and broadcast registries drain only
  *     on driver GC (ContextCleaner), which a large free heap defers, so
  *     a query timed ~100 executions into a JVM measures the drag, not
  *     the operator (measured on the smoke: tfidf 100x 54-68 s mid-pass
  *     vs 11.7-15 s in a fresh JVM, identical code — exactly the r7
  *     "contention that spanned all three passes"). Fresh JVM per pass
  *     makes passes independent and the sentinel comparable.
  *   - SENTINEL: a fixed-cost machine-health probe (bit_xor of xxhash64
  *     over a 400M-row range — constant work, no I/O, no code under
  *     test) timed at the start of every pass, emitted as
  *     `"sentinel":[...]`; a pass over 2.5x the best pass lands in
  *     `"contended_passes"` so a reader can tell "machine was busy" from
  *     "engine got slower".
  *   - ROTATION: each pass visits the queries at a rotated offset, so a
  *     stationary noisy window cannot hit the same neighborhood in every
  *     sample.
  *   - PRIOR-ROUND DELTA: medians deviating >3x either way from the
  *     committed previous BENCH_r*.json (or SPARK_GRAFT_BENCH_PRIOR) are
  *     listed in `"deviant_vs_prior"` — on unchanged code that flag
  *     means "re-run before committing".
  *   - [[graft.functions.Dedup.releaseCcLabels]] between queries, so CC
  *     checkpoint blocks never occupy executor storage across queries. */
object Bench {
  def main(args: Array[String]): Unit = {
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    if (runs > 1 && sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") != "0")
      forked(runs)
    else inProcess(runs)
  }

  private val SampleRe = """\[benchsample\] (\S+) (-?[0-9.]+)""".r
  private val SentinelRe = """\[benchsentinel\] ([0-9.]+)""".r

  /** Parent mode: one child JVM per pass (same flags + classpath,
    * `SPARK_GRAFT_BENCH_RUNS=1`, rotation offset via
    * `SPARK_GRAFT_BENCH_PASS`), samples parsed off child stdout, medians
    * merged here. Children pay their own sf0.001 warm-up (JIT state does
    * not transfer), which is the price of independent passes. */
  private def forked(runs: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until runs).foreach { pass =>
      System.err.println(s"[bench] ======== forked pass ${pass + 1}/$runs ========")
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_RUNS", "1")
      pb.environment().put("SPARK_GRAFT_BENCH_FORK", "0")
      pb.environment().put("SPARK_GRAFT_BENCH_PASS", pass.toString)
      pb.environment().put("SPARK_GRAFT_BENCH_NPASS", runs.toString)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
      Iterator.continually(out.readLine()).takeWhile(_ != null).foreach {
        case SampleRe(name, sec) =>
          samples(name) = sec.toDouble :: samples.getOrElse(name, Nil)
        case SentinelRe(s) => sentinels += s.toDouble
        case _ => () // children's own JSON line etc — parent emits the real one
      }
      val rc = p.waitFor()
      require(rc == 0, s"forked bench pass ${pass + 1} failed with rc=$rc")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { n =>
      val ts = samples.getOrElse(n, Nil)
      n -> (if (ts.isEmpty || ts.exists(_ < 0)) -1.0
            else ts.sorted.apply(ts.size / 2))
    }
    emit(sfDir, results, sentinels.toSeq)
  }

  /** One JVM: warm-up then `runs` in-process passes (the forked children
    * run this with runs=1 and a rotation offset from the parent). */
  private def inProcess(runs: Int): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passOffset = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASS", "0").toInt
    val nPass = sys.env.getOrElse("SPARK_GRAFT_BENCH_NPASS", runs.toString).toInt
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
      // bit_xor, not sum: ANSI mode makes a 400M-term Long sum an
      // arithmetic-overflow error; xor is overflow-free and same work
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    sentinel() // JIT the probe itself before any timed use
    names.foreach(execOnce(_, "/root/testdata/sf0.001")) // warm-up
    spark.catalog.clearCache() // drop warm-up caches: measure steady state
    graft.functions.Dedup.releaseCcLabels()
    val sentinels = new scala.collection.mutable.ArrayBuffer[Double]
    val samples: Seq[Map[String, Double]] = (0 until runs).map { inPass =>
      val s = sentinel(); sentinels += s
      println(f"[benchsentinel] $s%.4f")
      // rotate the visit order per pass: a stationary contention window
      // then hits a different neighborhood each sample
      val pass = passOffset + inPass
      val rotated = names.drop(pass * names.size / math.max(nPass, 1)) ++
        names.take(pass * names.size / math.max(nPass, 1))
      rotated.map { n =>
        val t = execOnce(n, sfDir)
        println(f"[benchsample] $n $t%.4f")
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
    spark.stop()
    emit(sfDir, results, sentinels.toSeq)
  }

  private def emit(sfDir: String, results: Seq[(String, Double)],
                   sentinels: Seq[Double]): Unit = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures carry a -1 sentinel per query; keep them OUT of the total
    // (a failing run must never report a better aggregate than a clean one)
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => k }
    if (failed.nonEmpty) System.err.println(s"[bench] FAILED: ${failed.mkString(",")}")
    val contended =
      if (sentinels.isEmpty) Seq.empty
      else sentinels.zipWithIndex.collect {
        case (s, i) if s > 2.5 * sentinels.min => i
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
