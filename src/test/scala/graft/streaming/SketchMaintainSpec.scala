package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.functions._

/** The maintained-sketch ingest loop: increments fold into exactly the
  * one-shot sketches, rounds replay after a crash, config drift is
  * refused, and the candidate floor keeps late-blooming heavy hitters. */
class SketchMaintainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tok = Tables.documents(spark, sf())
    .select(col("source"), explode(TextFunctions.words(
      TextFunctions.normText(col("text")))).as("w"))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("sketch_maintain").toString

  test("three increments equal the one-shot sketches over the union") {
    val dirS = tmp()
    (0 until 3).foreach { i =>
      val r = SketchMaintain.advance(spark,
        tok.where(pmod(crc32(col("w")), lit(3)) === i), "source", "w", dirS)
      r.commit()
      assert(r.round === i.toLong)
    }
    // CMS cells: cell-wise identical to the whole-stream sketch
    val whole = Sketches.cmsPartial(tok.select(col("w").as("_v")), col("_v"))
      .orderBy("_j", "_b").as[(Int, Long, Long)].collect().toSeq
    val roundDirs = new java.io.File(dirS).listFiles().map(_.getName)
      .filter(_.startsWith("round_")).sorted
    // dead committed rounds retire on the next advance: at most the
    // last-committed plus the round committed after it remain
    assert(roundDirs.length <= 2,
      s"earlier committed rounds must be retired: ${roundDirs.toSeq}")
    val lastDir = roundDirs.last
    val stored = spark.read.parquet(s"$dirS/$lastDir/cms")
      .orderBy("_j", "_b").as[(Int, Long, Long)].collect().toSeq
    assert(stored === whole)
    // KMV report: identical to the one-shot distinct sketch
    val kmvWhole = Sketches.kmvDistinct(tok, "source", col("w"))
      .orderBy("source").collect().toSeq
    val kmvStored = SketchMaintain.distinctReport(spark, dirS)
      .orderBy("source").collect().toSeq
    assert(kmvStored === kmvWhole)
    // heavy hitters: recall of the true set is perfect, estimates match
    // the batch form (identical merged cells)
    val support = 5
    val n = tok.count()
    val trueHh = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") * 1000 >= lit(n) * support).select("w")
      .as[String].collect().toSet
    val batch = Sketches.heavyHitters(tok.select(col("w").as("_v")),
      col("_v"), support).as[(String, Long)].collect().toMap
    val maintained = SketchMaintain.heavyHitters(spark, dirS, support)
      .as[(String, Long)].collect().toMap
    assert(trueHh.subsetOf(maintained.keySet))
    assert(maintained.keySet.subsetOf(batch.keySet))
    maintained.foreach { case (t, e) => assert(batch(t) === e) }
  }

  test("uncommitted round is swept and the round replays identically") {
    val dirS = tmp()
    val inc0 = tok.where(col("w") < "m")
    SketchMaintain.advance(spark, inc0, "source", "w", dirS).commit()
    val inc1 = tok.where(col("w") >= "m")
    val crashed = SketchMaintain.advance(spark, inc1, "source", "w", dirS)
    // no commit: the next advance must sweep round_1 and reuse its number
    val replay = SketchMaintain.advance(spark, inc1, "source", "w", dirS)
    assert(crashed.round === 1L && replay.round === 1L)
    val a = replay.cms.orderBy("_j", "_b").collect().toSeq
    replay.commit()
    val whole = Sketches.cmsPartial(tok.select(col("w").as("_v")), col("_v"))
      .orderBy("_j", "_b").collect().toSeq
    assert(a === whole)
  }

  test("a config change across rounds is refused") {
    val dirS = tmp()
    SketchMaintain.advance(spark, tok, "source", "w", dirS).commit()
    intercept[IllegalArgumentException] {
      SketchMaintain.advance(spark, tok, "source", "w", dirS, width = 2048)
    }
  }

  test("a replayed batch tag no-ops instead of double-counting") {
    val dirS = tmp()
    val inc = tok.limit(500)
    SketchMaintain.advance(spark, inc, "source", "w", dirS, tag = "b0").commit()
    val total0 = SketchMaintain.advance(spark, inc, "source", "w", dirS, tag = "b0")
    total0.commit() // must also be safe to call
    assert(total0.round === 0L && total0.totalValues === 500L,
      s"replay of b0 must return the committed round unchanged: $total0")
    val next = SketchMaintain.advance(spark, inc, "source", "w", dirS, tag = "b1")
    next.commit()
    assert(next.round === 1L && next.totalValues === 1000L)
  }

  test("streaming wiring: MemoryStream micro-batches maintain the same sketches") {
    val dirS = tmp()
    val ckpt = java.nio.file.Files.createTempDirectory("sketch_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = SketchMaintain.start(
      in.toDF().toDF("src", "w"), "src", "w", dirS, ckpt).start()
    val b0 = Seq("a" -> "x1", "a" -> "x2", "b" -> "x1")
    val b1 = Seq("a" -> "x1", "b" -> "x3", "b" -> "x3")
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val report = SketchMaintain.distinctReport(spark, dirS)
      .select("src", "est_distinct").as[(String, Long)].collect().toMap
    assert(report === Map("a" -> 2L, "b" -> 2L))
    val hh = SketchMaintain.heavyHitters(spark, dirS, 300)
      .as[(String, Long)].collect().toMap
    // x1: 3 of 6 values (500 permille), x3: 2 of 6 (333), x2: 1 of 6 (166)
    assert(hh === Map("x1" -> 3L, "x3" -> 2L))
  }

  test("null values are excluded from the sketches AND the running total") {
    val dirS = tmp()
    // 3 real values + 2 nulls: a null can never be estimated or recalled
    // (it hashes to null buckets), so counting it into the total would
    // deflate every candidate's support share — totalValues must be 3
    val inc = Seq(("s", "x"), ("s", "x"), ("s", "y"),
      ("s", null), ("t", null)).toDF("source", "w")
    val r = SketchMaintain.advance(spark, inc, "source", "w", dirS)
    r.commit()
    assert(r.totalValues === 3L)
    // x is 2 of 3 values (667 permille): with nulls in the total it would
    // read 2 of 5 (400) and miss a 600-permille query
    val hh = SketchMaintain.heavyHitters(spark, dirS, 600)
      .as[(String, Long)].collect().toMap
    assert(hh === Map("x" -> 2L))
    // the all-null group contributes no minima rows
    val report = SketchMaintain.distinctReport(spark, dirS)
      .select("source", "est_distinct").as[(String, Long)].collect().toMap
    assert(report === Map("s" -> 2L))
  }

  test("streaming wiring threads a custom geometry; resume of a custom-geometry stateDir is accepted") {
    val dirS = tmp()
    // bootstrap the stateDir with a NON-default geometry via advance()
    SketchMaintain.advance(spark, Seq(("a", "x1")).toDF("src", "w"),
      "src", "w", dirS, depth = 2, width = 64, k = 16).commit()
    val ckpt = java.nio.file.Files.createTempDirectory("sketch_ckpt_g").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    // pre-fix, start() could only run the default geometry, so resuming
    // this stateDir was refused by the config guard
    val q = SketchMaintain.start(in.toDF().toDF("src", "w"), "src", "w",
      dirS, ckpt, depth = 2, width = 64, k = 16).start()
    try {
      in.addData("a" -> "x2", "b" -> "x1"); q.processAllAvailable()
    } finally q.stop()
    val report = SketchMaintain.distinctReport(spark, dirS)
      .select("src", "est_distinct").as[(String, Long)].collect().toMap
    assert(report === Map("a" -> 2L, "b" -> 1L))
  }

  test("a held round survives later advances retiring its parquet (eager frames + release)") {
    val dirS = tmp()
    val r0 = SketchMaintain.advance(spark,
      Seq(("s", "x"), ("s", "y")).toDF("source", "w"), "source", "w", dirS)
    r0.commit()
    // pin the expected frames NOW, then advance TWICE — the second
    // advance retires round_0's parquet (only the last committed round
    // is live), which pre-fix made r0's lazy frames throw
    // FileNotFoundException on next access
    val cms0 = r0.cms.orderBy("_j", "_b").collect().toSeq
    val kmv0 = r0.kmv.collect().toSeq
    val cand0 = r0.candidates.collect().toSeq
    SketchMaintain.advance(spark,
      Seq(("s", "z")).toDF("source", "w"), "source", "w", dirS).commit()
    SketchMaintain.advance(spark,
      Seq(("t", "w")).toDF("source", "w"), "source", "w", dirS).commit()
    assert(!new java.io.File(s"$dirS/round_0").exists(),
      "round_0 parquet must be retired — otherwise this test proves nothing")
    assert(r0.cms.orderBy("_j", "_b").collect().toSeq === cms0)
    assert(r0.kmv.collect().toSeq === kmv0)
    assert(r0.candidates.collect().toSeq === cand0)
    assert(r0.totalValues === 2L)
    // release drops the cached blocks without touching the live rounds
    r0.release()
    assert(SketchMaintain.distinctReport(spark, dirS).count() === 2L)
  }

  test("eagerFrames=false skips the read-back loads (handler mode)") {
    val dirS = tmp()
    // count job submissions: the lazy advance must run strictly fewer
    // jobs than the eager one on the same increment shape — the three
    // read-back cache+count jobs are exactly what it skips
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rLazy = SketchMaintain.advance(spark,
        Seq(("s", "x"), ("s", "y")).toDF("source", "w"), "source", "w", dirS,
        tag = "b0", eagerFrames = false)
      rLazy.commit()
      Thread.sleep(300) // let job-start events land
      val lazyJobs = jobs.get()
      // nothing cached: the frames are plain lazy scans, release a no-op
      for (f <- Seq(rLazy.cms, rLazy.kmv, rLazy.candidates))
        assert(f.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
      rLazy.release()
      // the frames still read fine while the round is live, and the
      // stored state is byte-identical to an eager advance's
      assert(rLazy.kmv.count() === 2L && rLazy.totalValues === 2L)
      // a replayed tag in lazy mode also skips the read-back loads
      val replay = SketchMaintain.advance(spark,
        Seq(("s", "x"), ("s", "y")).toDF("source", "w"), "source", "w", dirS,
        tag = "b0", eagerFrames = false)
      assert(replay.round === rLazy.round && replay.totalValues === 2L)
      assert(replay.cms.storageLevel ===
        org.apache.spark.storage.StorageLevel.NONE)
      jobs.set(0)
      val dirE = tmp()
      SketchMaintain.advance(spark,
        Seq(("s", "x"), ("s", "y")).toDF("source", "w"), "source", "w", dirE)
        .commit()
      Thread.sleep(300)
      val eagerJobs = jobs.get()
      assert(lazyJobs < eagerJobs,
        s"lazy advance ran $lazyJobs jobs, eager $eagerJobs — expected " +
          "the three read-back loads to disappear")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("an item crossing the threshold in a later round is recalled; query below floor refused") {
    val dirS = tmp()
    // round 0: "late" is 1 of 2001 values (0.5 permille) -> pruned at floor 1
    val r0 = (1 to 2000).map(i => ("s", s"bulk$i")) :+ (("s", "late"))
    SketchMaintain.advance(spark, r0.toDF("source", "w"), "source", "w", dirS).commit()
    assert(SketchMaintain.heavyHitters(spark, dirS, 100).count() === 0)
    // round 1: "late" floods in -> overall share ~17% must be recalled
    val r1 = (1 to 500).map(_ => ("s", "late"))
    SketchMaintain.advance(spark, r1.toDF("source", "w"), "source", "w", dirS).commit()
    val hh = SketchMaintain.heavyHitters(spark, dirS, 100)
      .as[(String, Long)].collect().toMap
    assert(hh.keySet === Set("late"))
    assert(hh("late") >= 501L) // CMS never under-counts the full history
    intercept[IllegalArgumentException] {
      SketchMaintain.heavyHitters(spark, dirS, 0)
    }
  }
}
