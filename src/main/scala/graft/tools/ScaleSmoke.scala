package graft.tools

import graft._
import graft.functions.{Dedup, Similarity, TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend smoke (dev diagnostic): replicates the driver-provided
  * documents/embeddings tables N× (ids remapped to stay unique, text
  * salted so replicas are near- but not exact duplicates) and times the
  * operators whose 100 TB story depends on sub-quadratic behavior. A
  * healthy run shows ~linear growth for the map-side and bucketed
  * operators; the exhaustive baselines (p6-style all-pairs) are expected
  * to grow with shared-shingle pair count and are excluded here.
  *
  * Noise defense mirrors [[graft.Bench]]: each (family, factor) point is
  * the MEDIAN of `SPARK_GRAFT_SMOKE_RUNS` (default 3) samples taken on
  * whole-matrix passes — run every family at every factor, then repeat
  * the whole matrix — so a minutes-long noisy neighbor can poison at
  * most one sample per point and the median discards it. (The r5→r6
  * substring_overlap 4.4→10.9 s flap was exactly a single-sample
  * artifact this kills.) Cache cleared between samples. Passes run in
  * SEPARATE JVMs by default (`SPARK_GRAFT_SMOKE_FORK=0` opts out): an
  * in-process pass loop contaminates the late samples of every pass
  * with accumulated executor state — see the note in [[main]].
  *
  * The five shuffle-heavy families whose plans the 100 TB story leans on
  * hardest (minhash_lsh, dedup_clusters, substring_overlap, tfidf_topk,
  * seq_packing) additionally run DEEP factors 40×/100× — at sf0.1 that
  * is a 500k-document corpus, big enough that a hidden super-linear
  * term (pair blow-up, unsplit hot key, corpus-sized window) shows as a
  * bent curve instead of hiding in noise.
  *
  * Usage: `runMain graft.tools.ScaleSmoke /root/testdata/sf0.1 1 4 10`
  * (deep factors via SPARK_GRAFT_SMOKE_DEEP, default "40,100";
  * set to "" to skip).
  */
object ScaleSmoke {

  /** N copies of docs with disjoint id ranges; replica k>0 texts get a
    * per-replica salt word appended so near-dup structure persists
    * without collapsing to exact duplicates. */
  def replicateDocs(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"replication factor must be positive, got $n")
    val step = 100000000L
    (0 until n).map { k =>
      docs.select((col("doc_id") + lit(k * step)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(col("text"), lit(s" replicasalt$k"))).as("text"))
    }.reduce(_ union _)
  }

  /** N copies with a per-replica tag suffixed onto EVERY word, not
    * appended at the end: an end-salted replica still shares every
    * interior 48-char window and most shingles with its siblings, so at
    * deep factors the cross-replica candidate-pair count would grow
    * C(n,2) BY CONSTRUCTION — the curve would measure the replication
    * scheme, not the operator. The per-word suffix is applied UNIFORMLY
    * within a replica, so two docs that share a shingle / substring
    * window share its transformed image too: each replica's INTERNAL
    * near-dup structure is preserved exactly, cross-replica sharing is
    * impossible (different tags), and pair density stays constant —
    * time-vs-factor isolates the operator's own scaling. Tag is
    * fixed-width so window geometry is identical across replicas.
    *
    * Measurement hygiene, learned the hard way: the tag MUST be applied
    * to replica 0 too, MUST be cheap, and the salted corpus MUST be
    * MATERIALIZED before timing. A first cut left k=0 as the raw column
    * and salted k>0 via an interpreted higher-order `transform(split)` —
    * the x1 point then measured codegen'd column reads while x4+
    * measured mostly interpreted per-word lambda evaluation (re-run once
    * per downstream consumer of `text`), and the "curve" showed a fake
    * 15–43× step at x4. Even a uniform single-pass `regexp_replace`
    * still dominated the timings, multiplied by every consumer of the
    * column (signature pass + both sides of the verify join). So the
    * deep suite writes each factor's salted corpus to parquet ONCE,
    * outside the timed region, and times operators against the table —
    * which is also what production looks like.
    *
    * The tag must also survive `normText` as PART of its word: an
    * earlier `word#0001` variant normalized to two tokens
    * (`word 0001`), so every trigram shingle of shape
    * (tag, word, tag) depended on ONE word — all docs sharing any
    * common word shared that shingle, the shared shingle won the
    * min-hash in every band, and LSH collapsed the corpus into a
    * handful of buckets (4.9M candidate pairs from 5k docs). The
    * alphanumeric no-separator suffix keeps one-token words and full
    * three-word shingle context. */
  def replicateDocsDistinct(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"replication factor must be positive, got $n")
    val step = 100000000L
    (0 until n).map { k =>
      val salted = regexp_replace(col("text"), "(\\S+)", f"$$1x$k%04d")
      docs.select((col("doc_id") + lit(k * step)).as("doc_id"), salted.as("text"))
    }.reduce(_ union _)
  }

  def replicateEmbs(embs: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"replication factor must be positive, got $n")
    val step = 100000000L
    (0 until n).map { k =>
      embs.select((col("vec_id") + lit(k * step)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ union _)
  }

  /** Replicas with the embedding ROTATED k positions: a rotation keeps
    * norms but decorrelates the copy from its source, so the corpus
    * grows with genuinely new directions instead of exact duplicates.
    * Needed by the semdedup family: identical replicas all land in ONE
    * k-means cell by definition (k-means cannot split coincident
    * points), which would make any cluster-bounded pair scan
    * quadratic-by-fixture — a 99%-copies corpus measures the fixture,
    * not the operator. */
  def replicateEmbsRotated(embs: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"replication factor must be positive, got $n")
    val step = 100000000L
    (0 until n).map { k =>
      val rot = k % 64
      val e =
        if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, 64 - rot),
          slice(col("embedding"), 1, rot))
      embs.select((col("vec_id") + lit(k * step)).as("vec_id"),
        e.as("embedding"), col("label"))
    }.reduce(_ union _)
  }

  /** N copies of orders with disjoint key ranges — the snapshot-diff
    * growth axis (table size grows, the change set stays FIXED, which is
    * what a real capture round looks like). */
  def replicateOrders(orders: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"replication factor must be positive, got $n")
    val step = 100000000L
    (0 until n).map { k =>
      orders.select((col("o_orderkey") + lit(k * step)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    }.reduce(_ union _)
  }

  /** N copies of the event stream with disjoint key ranges (scaling the
    * USER population, the realistic growth axis for keyed CEP) and ids
    * remapped to stay unique. */
  def replicateEvents(events: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"replication factor must be positive, got $n")
    val kStep = 100000L
    val idStep = 100000000L
    (0 until n).map { k =>
      events.select((col("user_id") + lit(k * kStep)).as("user_id"),
        (col("event_id") + lit(k * idStep)).as("event_id"),
        col("event_type"), col("value"), expr("ts_ns div 1000").as("ts_us"))
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 4, 10)
    val deepFactors = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DEEP", "40,100")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt)
      .filterNot(factors.contains)
    val deep400Factors = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DEEP400", "400")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt)
      .filterNot(n => factors.contains(n) || deepFactors.contains(n))
    val runs = sys.env.getOrElse("SPARK_GRAFT_SMOKE_RUNS", "3").toInt
    // PROCESS-PER-PASS is the default for multi-pass runs: an in-process
    // pass loop poisons the late (deep-factor) points of every early pass
    // — shuffle-file and broadcast registries are cleaned by the
    // ContextCleaner only on driver GC, which a 48g heap defers for most
    // of a pass, so samples taken ~90 queries into a JVM measure the
    // accumulated-state drag, not the operator (observed: tfidf_topk
    // 100x at 54-68 s in passes whose JVM had history vs 11.7-15 s in a
    // fresh one, same code). A forked pass starts with a fresh JVM; the
    // parent merges medians, and the per-pass sentinel then compares
    // MACHINE state cleanly across identical process lifecycles.
    if (runs > 1 && sys.env.getOrElse("SPARK_GRAFT_SMOKE_FORK", "1") != "0")
      forkedPasses(dir, factors, deepFactors, deep400Factors, runs)
    else inProcess(dir, factors, deepFactors, deep400Factors, runs)
  }

  /** Materialize the salted corpora + snapshot fixtures once (the salting
    * transform must never sit inside a timed plan — see
    * [[replicateDocsDistinct]]); forked passes share one materialization. */
  private def materialize(spark: SparkSession, dir: String,
                          allFactors: Seq[Int], snapFactors: Seq[Int],
                          smokeDir: String): Unit = {
    val docs0 = Tables.documents(spark, dir).select("doc_id", "text")
    allFactors.foreach { n =>
      val t0 = System.nanoTime()
      replicateDocsDistinct(docs0, n)
        .write.mode("overwrite").parquet(s"$smokeDir/docs_x$n")
      println(f"[scale] materialize deep corpus x$n%-3d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // snapshots materialize for EVERY factor including the deep ones: the
    // snap-diff families are exactly where the digest prune's claim must
    // be proven at depth (a fixed ~100-row change set over a table that
    // grows 100x — churn 0.07% at 1x, 0.0007% at 100x; the verdict-r7
    // low-churn crossover requirement)
    snapFactors.foreach { n =>
      val t0 = System.nanoTime()
      val ordersN = replicateOrders(Tables.orders(spark, dir), n)
      ordersN.write.mode("overwrite").parquet(s"$smokeDir/orders_before_x$n")
      ordersN.where(!col("o_orderkey").isin(197L, 397L, 597L))
        .withColumn("o_totalprice",
          when(col("o_orderkey") < 100, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
        .write.mode("overwrite").parquet(s"$smokeDir/orders_after_x$n")
      graft.operators.SnapshotDiff.bucketDigests(
          spark.read.parquet(s"$smokeDir/orders_before_x$n"), Seq("o_orderkey"), 4096)
        .write.mode("overwrite").parquet(s"$smokeDir/orders_digests_x$n")
      println(f"[scale] materialize snapshots   x$n%-3d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
  }

  // rows may be negative: families force output consumption by summing
  // result VALUES (signed metrics like score_ppm included) — a
  // non-negative-only pattern silently drops those samples from the
  // artifact (caught: dsir's x1/x4 points vanished while its x10,
  // positive by luck, survived)
  // 5th field: the sample's IO-segment sentinel (the latest io probe
  // before it ran) — the r11 incident was minutes-long shared-disk
  // windows poisoning whole neighborhoods of unchanged-code deep points
  // while every CPU sentinel sat still; per-sample io tags let the
  // artifact median over samples from CLEAN disk segments only (the
  // Bench round-9 segment-sentinel design, IO edition)
  private val SampleRe = """\[scalesample\] (\S+) (\d+) ([0-9.]+) (-?\d+) ([0-9.]+)""".r
  private val SentinelRe = """\[scalesentinel\] ([0-9.]+)""".r
  private val IoSentinelRe = """\[scaleiosentinel\] ([0-9.]+)""".r
  /** Timed samples between io re-probes: ~6 keeps probe overhead ~2% of
    * a pass while a multi-minute disk window can poison at most one
    * segment's worth of samples per pass. */
  private val IoSegLen = 6

  /** Parent mode: materialize once, then run each pass as a CHILD JVM
    * (same JVM flags + classpath, `SPARK_GRAFT_SMOKE_RUNS=1`, shared
    * corpus dir), parse its `[scalesample]`/`[scalesentinel]` lines, and
    * merge cross-process medians into the artifact. */
  private def forkedPasses(dir: String, factors: Seq[Int],
                           deepFactors: Seq[Int], deep400Factors: Seq[Int],
                           runs: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val smokeDir = java.nio.file.Files.createTempDirectory("graft_smoke").toString
    locally {
      val spark = DevTool.session()
      // snapshots only for the factors whose suites use them — the ×400
      // tier reads docs + sem artifacts only
      materialize(spark, dir,
        (factors ++ deepFactors ++ deep400Factors).distinct.sorted,
        (factors ++ deepFactors).distinct.sorted, smokeDir)
      spark.stop()
    }
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val samples = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double, Long, Double)]
    val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ioSentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to runs).foreach { pass =>
      println(s"[scale] ======== forked pass $pass/$runs ========")
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.tools.ScaleSmoke", dir) ++
        factors.map(_.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_SMOKE_RUNS", "1")
      pb.environment().put("SPARK_GRAFT_SMOKE_FORK", "0")
      pb.environment().put("SPARK_GRAFT_SMOKE_DIR", smokeDir)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
      Iterator.continually(out.readLine()).takeWhile(_ != null).foreach {
        case SampleRe(tag, n, sec, rows, ioSeg) =>
          samples += ((tag, n.toInt, sec.toDouble, rows.toLong, ioSeg.toDouble))
        case SentinelRe(s) => sentinels += s.toDouble
        case IoSentinelRe(s) => ioSentinels += s.toDouble
        case l if l.startsWith("[scale]") => println(l)
        case _ => ()
      }
      val rc = p.waitFor()
      require(rc == 0, s"forked pass $pass failed with rc=$rc")
    }
    emitArtifact(dir, runs, samples.toSeq, sentinels.toSeq, ioSentinels.toSeq)
  }

  private def inProcess(dir: String, factors: Seq[Int],
                        deepFactors: Seq[Int], deep400Factors: Seq[Int],
                        runs: Int): Unit = {
    val spark = DevTool.session()
    val docs0 = Tables.documents(spark, dir).select("doc_id", "text")
    val embs0 = Tables.embeddings(spark, dir)
    // (family, factor, sec, rows, io-segment sentinel) across passes
    val samples = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double, Long, Double)]
    // machine-health probe, identical to Bench's: pure codegen arithmetic
    // over an in-memory range — constant work, no I/O, nothing under
    // test. Timed at the start of every pass; a pass whose sentinel blows
    // past the best pass's marks a contention window the interleaved
    // median could NOT absorb (the round-7 bench failure, and the suspect
    // for the non-monotone contam_bloom 40x point in SCALE_SMOKE_r07)
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: ANSI mode makes a 400M-term Long sum an
      // arithmetic-overflow error; xor is overflow-free and same work
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // IO-health probe (round 11): the CPU sentinel above is blind to DISK
    // contention, and the heavy deep-factor families are shuffle-bound —
    // the r11 incident was unchanged-code 100x points swinging 17->59 s
    // across passes while every CPU sentinel sat at 0.23 s (shared-disk
    // VM neighbor). This probe shuffles a fixed ~800 MB of incompressible
    // hashes (constant work, nothing under test): its ratio across passes
    // attributes exactly that class of swing.
    def ioSentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .selectExpr("xxhash64(id) AS h")
        .repartition(32, col("h"))
        .selectExpr("bit_xor(h) AS s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ioSentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    // io segment state: every IoSegLen timed samples, re-probe the disk
    // and tag subsequent samples with the probe value (see SampleRe doc).
    // DEEP-factor samples (40x/100x) are BRACKETED instead: their own
    // probe immediately before AND after, tag = max of the pair — the
    // r11 lesson was that this VM's disk windows open and close BETWEEN
    // the every-6-samples probes, so a "clean" segment could still carry
    // a 2-4x swing on an unchanged-code 13-s deep point (minhash_lsh
    // 13.3 s median vs 7.15 s best pass in a zero-flagged run). Deep
    // samples run 5-30 s each, so the extra ~1.3 s probe is affordable
    // exactly where the cadence was too coarse; shallow samples keep the
    // cadence (their families are also ~10x cheaper than the probe
    // budget would allow).
    var ioSeg = -1.0
    var sinceIoProbe = Int.MaxValue / 2 // force a probe at the first sample
    def time(tag: String, n: Int)(f: => Long): Unit = {
      val bracket = deepFactors.contains(n)
      if (bracket || sinceIoProbe >= IoSegLen) {
        ioSeg = ioSentinel(); ioSentinels += ioSeg; sinceIoProbe = 0
        println(f"[scaleiosentinel] $ioSeg%.4f")
      }
      sinceIoProbe += 1
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      val ioTag = if (bracket) {
        // the closing probe also opens the next segment: it is the
        // freshest disk reading anything after this sample can have
        val after = ioSentinel(); ioSentinels += after; sinceIoProbe = 0
        println(f"[scaleiosentinel] $after%.4f")
        val worst = math.max(ioSeg, after)
        ioSeg = after
        worst
      } else ioSeg
      println(f"[scale] $tag%-18s x$n%-3d $sec%8.2f s  rows=$rows")
      println(f"[scalesample] $tag $n $sec%.4f $rows $ioTag%.4f")
      samples += ((tag, n, sec, rows, ioTag))
      spark.catalog.clearCache() // operator caches must not leak across samples
    }

    val smokeDir = sys.env.get("SPARK_GRAFT_SMOKE_DIR") match {
      case Some(d) => d // forked child: parent already materialized
      case None =>
        val d = java.nio.file.Files.createTempDirectory("graft_smoke").toString
        materialize(spark, dir,
          (factors ++ deepFactors ++ deep400Factors).distinct.sorted,
          (factors ++ deepFactors).distinct.sorted, d)
        d
    }

    /** The five families whose 100 TB plans are shuffle-dominated — these
      * also run the deep factors, over the pervasively-salted corpus so
      * candidate-pair density stays constant per replica (see
      * [[replicateDocsDistinct]]). */
    def deepSuite(n: Int): Unit = {
      val docs = spark.read.parquet(s"$smokeDir/docs_x$n")
      // q36/q37 cohort-similarity pair, run at EVERY factor incl. deep:
      // the exact route's inverted index joins on the 24-value hour bin
      // (a parallelism ceiling AND a dense |Q|x|K| compare), the LSH
      // route on (table, bucket) — 1024 values — with the exact cosine
      // on bucket collisions only. The query population stays fixed
      // (base-replica ids < 20) while the key population scales with the
      // factor, so the LSH curve must grow with collision volume, not
      // the key count
      val eventsN = replicateEvents(Tables.events(spark, dir), n)
      time("activity_exact", n)(Similarity.activityCosineTopK(
        eventsN, "user_id", "ts_us", 3600000000L, col("user_id") < 20, 3).count())
      time("activity_lsh", n)(Similarity.activityCosineTopKLsh(
        eventsN, "user_id", "ts_us", 3600000000L, col("user_id") < 20, 3).count())
      // the r13 wide-bins routing at scale: bins=168 (hour-of-week) rides
      // the bin_count_agg kernel past the codegen maxFields limit —
      // O(1) per row, one exchange of array partials (ProbeFamily carries
      // the rejected fused-interpreted and two-step twins for A/B)
      // consumption folds the WHOLE array: element_at(hist, 1) would let
      // SimplifyExtractValueOps collapse the CreateArray to one
      // conditional sum and time 1/168th of the operator
      time("activity_hist_wide", n)(Similarity.activityHistogramsFromEvents(
        eventsN, "user_id", "ts_us", 3600000000L, bins = 168)
        .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
        .head().getLong(0))
      // the deployment shape: index built ONCE (untimed — it is a stored
      // artifact; forked passes share the materialization), every query
      // pays only the probe. The probe curve growing far below the full
      // route's is the "corpus scanned once" claim, measured.
      val idxPath = s"$smokeDir/activity_idx_x$n"
      if (!new java.io.File(s"$idxPath/_SUCCESS").exists())
        Similarity.activityLshIndex(eventsN, "user_id", "ts_us", 3600000000L)
          .write.mode("overwrite").parquet(idxPath)
      time("activity_probe", n)(Similarity.activityCosineTopKLshProbe(
        spark.read.parquet(idxPath), "user_id", col("user_id") < 20, 3).count())
      time("minhash_lsh", n)(Dedup.minhashLsh(docs, 8, 800).count())
      // the two round-10b shuffle-heavy additions ride the deep factors:
      // containment is the p19 inverted-index shape, estimation is the
      // minhash_lsh core + per-row array verify (probed sub-linear to
      // 100x: 6.2 s / 14.0 s warm)
      time("containment_scan", n)(Dedup.containmentScan(docs, 200).count())
      time("minhash_estimate", n)(Dedup.minhashJaccardEstimate(docs, 8, 500)
        .agg(sum(col("est_milli") + col("jacc_milli"))).head().getLong(0))
      time("dedup_clusters", n)(Dedup.nearDupClusters(docs, 8, 800).count())
      // p37's shape at depth (r14): in-query LSH index over 3/4 of the
      // corpus + increment probe of the rest. Committed so the r13
      // rule-exclusion win (probe x40 5.66 -> 3.53 s, previously only a
      // ProbeFamily record) stays regression-guarded the way
      // activity_hist_wide is — a re-enabled InferFiltersFromGenerate
      // (or any future rule that clones the minhash_bands kernel into a
      // scan filter) shows up as this curve stepping back up
      time("cross_corpus", n) {
        val newDocs = docs.where(pmod(col("doc_id"), lit(4)) === 0)
        val oldIdx = Dedup.lshIndex(docs.where(pmod(col("doc_id"), lit(4)) =!= 0), 8)
        Dedup.crossCorpusPairs(newDocs, oldIdx, 8, 800).count()
      }
      time("substring_overlap", n)(Dedup.substringOverlapPairs(docs, 48, 2L).count())
      // the span REWRITE next to the pair detector: per-word replica tags
      // keep cross-replica verdicts impossible, so coverage density stays
      // constant per replica and the curve isolates the operator (forced
      // through values — see the line_dedup note on count() elimination)
      time("span_scrub", n)(Dedup.duplicateSpanScrub(docs, 48, 2L)
        .agg(sum(col("covered_chars") + length(col("scrubbed_md5")))).head().getLong(0))
      // stage attribution for the two steepest 100x curves (round-9 ask):
      // cumulative-prefix timings at the deep factors only — the hash
      // explode alone, then + the verdict build — so each full-operator
      // point decomposes into explode vs verdict vs join+rollup (the
      // remainder), and round 11 can see WHICH stage steepens before the
      // next doubling. Same decomposition for tfidf: the (doc, word)
      // tf exchange alone, then + the vocabulary df pass; the remainder
      // is the join-back + per-doc top-k window.
      if (n >= 40) {
        val pw = docs.select(col("doc_id"),
            explode(call_function("anchor_window_pos_hashes", col("text"), lit(48)))
              .as("_pw"))
          .select(col("doc_id"), col("_pw.pos").as("_pos"), col("_pw.wh").as("_wh"))
        time("span_scrub_hash", n)(pw.count())
        // the round-11 verdict shape: per-doc-DISTINCT hashes dedup inside
        // the kernel's array, one partial-agg'd shuffle on the hash (the
        // old distinct-(doc,wh)-then-groupBy pair shuffled the positioned
        // stream twice and was ~50% of the operator at 100x)
        time("span_scrub_verdict", n)(docs.select(col("doc_id"),
            explode(call_function("anchor_window_hashes", col("text"), lit(48)))
              .as("_wh"))
          .groupBy(col("_wh")).agg(count(lit(1)).as("_docs"))
          .where(col("_docs") >= 2).count())
        // the round-11 tf shape: per-doc term counts are MAP-SIDE (the
        // word_term_counts kernel) — tfidf_tf now measures the kernel
        // scan, tfidf_df the one vocabulary-sized exchange; the exploded
        // (doc, word) groupBy this stage used to time no longer exists
        // in the operator
        val tfStage = docs.select(col("doc_id"),
            explode(call_function("word_term_counts",
              TF.words(TF.normText(col("text"))))).as("_wt"))
          .select(col("doc_id"), col("_wt.word").as("word"), col("_wt.tf").as("tf"))
        time("tfidf_tf", n)(tfStage.count())
        time("tfidf_df", n)(
          tfStage.groupBy("word").agg(count(lit(1)).as("df")).count())
      }
      time("tfidf_topk", n) {
        TF.tfidfTopK(docs.withColumn("_ws", TF.words(TF.normText(col("text")))),
          col("_ws"), 3).count()
      }
      // global-order prefix sum (the packing device): blocks + seam
      // offsets — must scale like any keyed window, not a 1-task sort
      time("seq_packing", n) {
        val toks = docs.select(col("doc_id"),
          TF.wordCount(TF.words(TF.normText(col("text")))).as("wc"))
        graft.operators.PrefixSum.runningBefore(toks, "doc_id", "wc", "off").count()
      }
      // bloom-prefiltered decontamination (p33 shape): ~5% of docs play
      // the held-out suite; the sketch build + map-side prune + verify
      // join are all shingle-volume-bound, the axis the factor scales
      time("contam_bloom", n) {
        val sh = Dedup.shingleArrays(docs)
        val train = sh.where(pmod(col("sid"), lit(20)) =!= 0)
          .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
        val test = sh.where(pmod(col("sid"), lit(20)) === 0)
          .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
        Dedup.contaminationPairs(train, test, 3L).count()
      }
      // snapshot diff at depth: table grows with the factor, the CHANGE
      // SET stays fixed (keys < 100 updated, three keys deleted — all in
      // the base replica's range) — the realistic repeated-capture round,
      // against PERSISTED snapshots (a capture loop diffs stored parquet
      // images; a lazily-recomputed snapshot would bill its own lineage
      // to every scan the diff makes). The full diff pays two scans plus
      // a full-table PK-join exchange on BOTH sides; the incremental
      // prune pays ONE scan (digesting the new snapshot — last round's
      // digests are a stored artifact) plus dirty-bucket-only joins. At
      // 1x the four-scan overhead can exceed the avoided join (expected,
      // documented); as the table grows and churn falls toward zero the
      // avoided exchange dominates and incr must CROSS BELOW full by a
      // widening margin — that crossover is the claim this curve records.
      val beforeSnap = spark.read.parquet(s"$smokeDir/orders_before_x$n")
      val afterSnap = spark.read.parquet(s"$smokeDir/orders_after_x$n")
      time("snap_diff_full", n)(
        graft.operators.SnapshotDiff.diff(beforeSnap, afterSnap,
          Seq("o_orderkey")).count())
      time("snap_diff_incr", n) {
        val prevDigests = spark.read.parquet(s"$smokeDir/orders_digests_x$n")
        graft.operators.SnapshotDiff.diffPrunedIncremental(
          beforeSnap, prevDigests, afterSnap, Seq("o_orderkey")).count()
      }
      // SemDeDup at depth: rotated replicas (decorrelated — see
      // replicateEmbsRotated) and a codebook k = min(16·n, 512). The cap
      // is a MEASURED two-sided trade, not an oversight (r14 probed both
      // regimes end to end): uncapping to the paper's k ∝ n flattens the
      // within-cell SCAN (SemKnProbe ×400: capped min 3.78 s vs k∝n
      // 1.35 s — the scan is ~n²/k) but regresses the INCREMENT probe
      // 2.2× at ×100 (semdedup_probe min 2.63 → 5.73 s, 3-pass medians,
      // SCALE_SMOKE_LOCAL_r14 vs the rejected r14b run): `nearest_cell`
      // assignment is exact over all k cells, so each probed batch pays
      // batch_rows × k — with k ∝ n the per-increment cost grows with
      // the STORED corpus and the flat-increment claim (1.17× per 4×
      // data under the cap, measured to ×400) breaks. The smoke keeps
      // the index+increment posture; a bulk scan-dominated dedup round
      // should size k with the corpus instead (semDedupOnIndex scaladoc
      // records both regimes). Codebook AND inverted file are the
      // stored artifacts (trained/assigned untimed — the activity_probe
      // posture; forked passes share the materialization); the timed
      // region is what a dedup round actually pays: the within-cell
      // pair scan + keeper fold over the stored index.
      semDedupPair(n)
    }

    /** Capped-codebook SemDeDup scan + increment at factor `n` (artifact
      * shared across forked passes). */
    def semDedupPair(n: Int): Unit = {
      val semIdxPath = s"$smokeDir/sem_idx_x$n"
      val semModelPath = s"$smokeDir/sem_model_x$n"
      if (!new java.io.File(s"$semIdxPath/_SUCCESS").exists()) {
        val embsN = replicateEmbsRotated(Tables.embeddings(spark, dir), n)
        val semModel = graft.functions.IvfIndex.train(embsN,
          k = math.min(16 * n, 512), iters = 3)
        graft.functions.IvfIndex.saveModel(semModel, semModelPath)(spark)
        graft.functions.IvfIndex.index(embsN, semModel)
          .write.mode("overwrite").parquet(semIdxPath)
      }
      time("semdedup", n)(
        Similarity.semDedupOnIndex(spark.read.parquet(semIdxPath), 450000L)
          .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0))
      // the ingest increment: a FIXED batch (the 2000-vector base corpus,
      // re-id'd above every stored id) probed against the x-n stored
      // index — "each increment pays its own size" means this curve must
      // stay near-flat while the stored corpus grows 100x (the stored
      // side is scanned once and never shuffled; the assigned batch
      // broadcasts)
      time("semdedup_probe", n) {
        val semModel = graft.functions.IvfIndex.loadModel(semModelPath)(spark)
        Similarity.semDedupIncrement(spark.read.parquet(semIdxPath),
            semBatch, semModel, 450000L)
          .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0)
      }
    }

    def semBatch = Tables.embeddings(spark, dir)
      .select((col("vec_id") + lit(990000000L)).as("vec_id"),
        col("embedding"), col("label"))

    /** TWO-LEVEL SemDeDup scan + increment (r15): total fine cells ∝ n
      * through a ≤64-cell coarse router — the regime that resolves the
      * r14 capped-vs-k∝n trade (scan stays off the n²/k drift AND the
      * increment stays flat; SemKnProbe carries the three-way A/B with
      * the flat books). Codebooks ride CodebookCodec-packed binary
      * literals — the boxed-literal plumbing tax was the real increment
      * cost, see the assign_literal_tax ProbeFamily family (née AssignProbe r15). */
    def semDedupTwoPair(n: Int): Unit = {
      val idxPath = s"$smokeDir/sem2_idx_x$n"
      val modelPath = s"$smokeDir/sem2_model_x$n"
      if (!new java.io.File(s"$idxPath/_SUCCESS").exists()) {
        val embsN = replicateEmbsRotated(Tables.embeddings(spark, dir), n)
        val m2 = graft.functions.IvfIndex.trainTwoLevel(embsN,
          kTotal = 16 * n, iters = 3)
        graft.functions.IvfIndex.saveModel2(m2, modelPath)(spark)
        graft.functions.IvfIndex.index2(embsN, m2)
          .write.mode("overwrite").parquet(idxPath)
      }
      time("semdedup_two", n)(
        Similarity.semDedupOnIndex(spark.read.parquet(idxPath), 450000L)
          .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0))
      time("semdedup_two_probe", n) {
        val m2 = graft.functions.IvfIndex.loadModel2(modelPath)(spark)
        Similarity.semDedupIncrement2(spark.read.parquet(idxPath),
            semBatch, m2, 450000L)
          .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0)
      }
    }

    /** r15 ×400 drift tier: the families whose ×100 curves could not see
      * their depth drift (containment's train-side sort, the capped
      * semdedup scan's n²/k) plus the two-level pair, at the deep400
      * factors. The pre-existing families' ×100 comparison points come
      * from the regular deep suite; semdedup_two gets its own ×100 pair
      * from the pass loop. Cheap by construction — four timed samples
      * per pass over shared artifacts. */
    def deep400Suite(n: Int): Unit = {
      val docs = spark.read.parquet(s"$smokeDir/docs_x$n")
      time("containment_scan", n)(Dedup.containmentScan(docs, 200).count())
      semDedupPair(n)
      semDedupTwoPair(n)
    }

    def fullSuite(n: Int): Unit = {
      val docs = replicateDocs(docs0, n)
      val embs = replicateEmbs(embs0, n)
      time("exact_dedup", n)(Dedup.exact(docs).count())
      time("simhash_buckets", n)(Dedup.simhashBuckets(docs).count())
      time("repetition_p15", n) {
        docs.select(col("doc_id"), call_function("word_rep_stats", col("text")).as("s"))
          .select(col("doc_id"), col("s.total")).where(col("total") >= 0).count()
      }
      time("lsh_knn", n)(
        Similarity.lshKnn(embs, col("vec_id") < 20, 3).count())
      // train cost must flatten once the corpus passes the sample cap
      // (engages at 4x/10x with sf0.1's 2000-vector base)
      time("ivf_train", n) {
        graft.functions.IvfIndex.train(embs, k = 16, iters = 3,
          maxTrainVectors = 4000).k.toLong
      }
      time("hash_split", n)(
        docs.select(TF.splitBucket(col("doc_id")).as("b")).groupBy("b").count().count())
      time("vocab_coverage", n)(TF.vocabCoverage(docs, 100).count())
      time("embed_outliers", n)(
        Similarity.labelCentroidOutliers(embs, 10).count())
      time("token_quantiles", n) {
        val wc = docs.select(pmod(col("doc_id"), lit(5)).as("g"),
          TF.wordCount(TF.words(TF.normText(col("text")))).as("v"))
        graft.operators.Distribution.groupedDiscreteQuantiles(wc, "g", "v",
          Seq(("p50", 1, 2), ("p90", 9, 10))).count()
      }
      // p24's documented hot-word trade, measured: plant a word in EVERY
      // document and force the df join down the sort-merge path (broadcast
      // disabled) — the regime where tf shuffles BY WORD and a hot word
      // lands on one reducer. AQE's skew split is the designed handler;
      // this curve is the recorded justification for not hard-wiring
      // SaltedJoin into p24 (the escape hatch exists for known hot keys).
      time("tfidf_skew_smj", n) {
        val skewed = docs.select(col("doc_id"),
          concat(col("text"), lit(" hotstopword hotstopword")).as("text"))
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try TF.tfidfTopK(skewed.withColumn("_ws", TF.words(TF.normText(col("text")))),
          col("_ws"), 3).count()
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
      // CEP family over a replicated event stream (keys disjoint per
      // replica — the window detectors scale with key parallelism, the
      // guarded band join with horizon density)
      val events = replicateEvents(Tables.events(spark, dir), n)
      val h12 = 12L * 3600 * 1000000L
      time("cep_followed_by", n)(graft.operators.Patterns.followedBy(events,
        "user_id", "ts_us", "event_id", "event_type", "signup", "purchase", h12).count())
      time("cep_chain", n)(graft.operators.Patterns.chain(events,
        "user_id", "ts_us", "event_id", "event_type", "signup", "view", "purchase",
        2 * h12).count())
      time("cep_guarded_band", n)(graft.operators.Patterns.guardedFollowedBy(events,
        "user_id", "ts_us", "event_id", "event_type", "value",
        "signup", "purchase", h12, (av, bv) => bv > av).count())
      // the band join's worst case, planted: HALF the stream remapped to
      // ONE key. A plain key join would pair that key's every A with its
      // every B (|A|·|B|, quadratic in factor AND horizon count); the
      // band equi-join keeps pairs inside each 2·within neighborhood, so
      // growth tracks per-band density (n² only within one band width),
      // never |A|·|B| over the whole retained history. PatternsSpec pins
      // the mechanism (B duplicated exactly 2×, _band in the join keys);
      // this curve records the wall-clock consequence.
      time("cep_guarded_hotkey", n) {
        val hot = events.select(
          when(pmod(col("user_id"), lit(2)) === 0, lit(0L))
            .otherwise(col("user_id")).as("user_id"),
          col("event_id"), col("event_type"), col("value"), col("ts_us"))
        graft.operators.Patterns.guardedFollowedBy(hot,
          "user_id", "ts_us", "event_id", "event_type", "value",
          "signup", "purchase", h12, (av, bv) => bv > av).count()
      }
      time("cep_length_window", n)(graft.operators.Patterns.lengthWindow(
        events.where(col("event_type") === "purchase"),
        "user_id", "ts_us", "event_id", "value", 5).count())
      // round-9b ops. line_dedup runs word-as-line (the corpus carries no
      // newlines): identical plan shape — explode, two cell-sized partial
      // aggs for the verdict set, broadcast back, id-keyed reassembly —
      // so the curve measures the operator, not a synthetic reline pass.
      // These three MUST consume output VALUES, not count(): their final
      // row count is docs-count via a left join against a unique-keyed
      // aggregate, which the optimizer rightly eliminates under count()
      // — a count() "curve" here measured an empty plan (flat 0.2 s at
      // 100x while the forced form is seconds)
      time("line_dedup", n)(Dedup.lineDedup(docs, 2L, delim = " ")
        .agg(sum(col("kept_lines") + length(col("new_text")))).head().getLong(0))
      time("bigram_lm", n)(TF.bigramLmScore(docs)
        .agg(sum(col("score_ppm") + col("n_bigrams"))).head().getLong(0))
      // the aggregation ladder: hour cells from raw rows, day from hour
      // cells — growth must track the ONE finest-grain exchange
      time("incr_agg", n) {
        val ladder = graft.operators.IncrementalAgg.rollup(events,
          "user_id", "ts_us", "value", Seq(
            "hour" -> 3600000000L, "day" -> 86400000000L))
        graft.operators.IncrementalAgg.query(ladder, "day",
          Long.MinValue, Long.MaxValue).count()
      }
      // round-10 ops. KMV: the only corpus-sized exchange is the
      // (source, hash) distinct; the bottom-k runs on distinct hashes.
      // DSIR: token explode + vocab-sized model + join-back — the p43
      // plan shape, so the curve should track bigram_lm's. Both consume
      // values (the left-join/row_number tails would not survive a bare
      // count()).
      time("kmv_sketch", n) {
        val tok = docs.select(pmod(col("doc_id"), lit(20)).as("src"),
          explode(TF.words(TF.normText(col("text")))).as("_w"))
        graft.functions.Sketches.kmvDistinct(tok, "src", col("_w"))
          .agg(sum(col("est_distinct") + col("kth_hash"))).head().getLong(0)
      }
      time("dsir", n)(TF.dsirScores(docs, pmod(col("doc_id"), lit(5)) === 0)
        .agg(sum(abs(col("score_ppm")) + col("n_tokens"))).head().getLong(0))
      // round-10b ops. CMS: cells are a depth×width constant, so growth
      // must track the token explode alone. Novelty: one bigram explode
      // + two cell aggregations, no corpus join-back. Containment: the
      // p19 inverted-index join normalized per test doc. Novelty consumes
      // values (doc-keyed left-join tail); the other two end in filters
      // count() cannot eliminate.
      // (estimate-sum form, not the thresholded HH list: replica word
      // salting dilutes every token below any fixed support at depth, so
      // the HH filter would empty the tail — the estimate pass IS the
      // work and its sum forces every cell + probe)
      time("cms_heavy_hitters", n) {
        val tok = docs.select(explode(TF.words(TF.normText(col("text")))).as("_w"))
        val cells = graft.functions.Sketches.cmsPartial(tok, col("_w"))
        graft.functions.Sketches.cmsEstimate(tok.distinct(), "_w", cells)
          .agg(sum(col("est_cnt"))).head().getLong(0)
      }
      time("ngram_novelty", n)(TF.ngramNovelty(docs)
        .agg(sum(col("novel_cnt") + col("novelty_pm"))).head().getLong(0))
      // token-pair statistics: both collapse to alphabet/vocab-sized
      // cells after one partial agg — growth must track the explodes
      time("collocations", n)(
        TF.collocations(docs, 5L, 50).agg(sum(col("pmi_ppm"))).head().getLong(0))
      time("bpe_pairs", n)(
        TF.bpePairStats(docs, 40).agg(sum(col("cnt"))).head().getLong(0))
      // containment_scan and minhash_estimate live in deepSuite (which
      // also covers the shallow factors) — their shuffle-heavy joins
      // are the ones the deep factors must pressure
    }

    // warm-up
    Dedup.minhashLsh(docs0.limit(500), 8, 800).count()
    spark.catalog.clearCache()
    sentinel() // JIT the probe itself before any timed use
    ioSentinel()

    (1 to runs).foreach { pass =>
      val s = sentinel(); sentinels += s
      println(f"[scale] ======== pass $pass/$runs (sentinel $s%.3f s) ========")
      println(f"[scalesentinel] $s%.4f")
      // io probes run every IoSegLen samples inside time() — per-sample
      // segment tags, not per-pass snapshots (a mid-pass disk window is
      // exactly what a pass-start probe cannot see)
      factors.foreach { n => fullSuite(n); deepSuite(n) }
      deepFactors.foreach(deepSuite)
      // the ×400 drift tier + the two-level pair's own ×100 point (its
      // ratio partner; skipped when the tier is disabled or the run
      // carries no ×100 deep point to anchor against)
      if (deep400Factors.nonEmpty && deepFactors.contains(100))
        semDedupTwoPair(100)
      deep400Factors.foreach(deep400Suite)
      graft.functions.Dedup.releaseCcLabels()
    }

    spark.stop()
    // a forked child (runs=1) feeds its parent via the [scalesample]
    // lines; its own one-sample artifact line is parsed by nobody and
    // harmless. Multi-pass in-process runs (SPARK_GRAFT_SMOKE_FORK=0)
    // keep the original single-JVM artifact path.
    emitArtifact(dir, runs, samples.toSeq, sentinels.toSeq, ioSentinels.toSeq)
  }

  /** One-line JSON artifact: per (family, factor) the MEDIAN seconds
    * across passes + result rows (identical every pass by determinism) —
    * the recorded scale curve behind the 100 TB sub-quadratic claims,
    * with the per-pass CPU sentinels, the per-segment IO sentinels, and
    * contamination flags.
    *
    * IO-clean medians (round 11): each sample carries its io-segment
    * sentinel; the reported median uses samples whose segment ran
    * <= 2.5x the run's best io probe. A (family, factor) left with ZERO
    * clean samples keeps the all-sample median and is listed in
    * `io_contaminated` — re-run before trusting that point. (The r11
    * incident: unchanged-code minhash_lsh 100x swung 7.2/13.3/21.6 s
    * across passes on a shared-disk VM while every CPU sentinel sat at
    * ~0.25 s; the healthy sample matched the prior round exactly.)
    * Deep-factor samples are additionally probe-BRACKETED (see `time`),
    * so their clean tag certifies the disk on both sides of the sample.
    *
    * `min` (round 12): each point also records its best sample across
    * all passes — contention only ever slows a deterministic operator,
    * so on unchanged code min-vs-min is the drift comparison that no
    * disk window can fake in the slow direction. */
  private def emitArtifact(dir: String, runs: Int,
                           samples: Seq[(String, Int, Double, Long, Double)],
                           sentinels: Seq[Double],
                           ioSentinels: Seq[Double] = Seq.empty): Unit = {
    val ioFloor =
      if (ioSentinels.isEmpty) Double.MaxValue else 2.5 * ioSentinels.min
    val ioContaminated = scala.collection.mutable.ArrayBuffer.empty[String]
    val families = samples.groupBy(_._1).toSeq.sortBy(_._1).map { case (fam, rs) =>
      val ser = rs.groupBy(_._2).toSeq.sortBy(_._1).map { case (n, ss) =>
        def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
        val clean = ss.collect { case (_, _, t, _, io) if io <= ioFloor => t }
        val med =
          if (clean.nonEmpty) median(clean)
          else { ioContaminated += s"$fam:x$n"; median(ss.map(_._3)) }
        val rows = ss.map(_._4).max
        // Locale.ROOT: the f-interpolator renders decimal COMMAS under
        // de/fr default locales, corrupting the JSON artifact
        val sec = String.format(java.util.Locale.ROOT, "%.2f", Double.box(med))
        val mn = String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(ss.map(_._3).min))
        s"""{"factor":$n,"sec":$sec,"min":$mn,"rows":$rows,"samples":${ss.size},"clean":${clean.size}}"""
      }.mkString("[", ",", "]")
      s""""$fam":$ser"""
    }.mkString("{", ",", "}")
    val sentJson = sentinels.map(s =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))).mkString("[", ",", "]")
    val contended =
      if (sentinels.isEmpty) Seq.empty
      else sentinels.zipWithIndex.collect {
        case (s, i) if s > 2.5 * sentinels.min => i
      }
    val ioJson = ioSentinels.map(s =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))).mkString("[", ",", "]")
    // IO windows: flagged against the run's BEST io probe — a shared-disk
    // neighbor typically doubles-to-quintuples the fixed shuffle, while
    // the CPU sentinel sits still (the r11 incident signature)
    val ioContended =
      if (ioSentinels.isEmpty) Seq.empty
      else ioSentinels.zipWithIndex.collect {
        case (s, i) if s > ioFloor => i
      }
    val ioContamJson = ioContaminated.map("\"" + _ + "\"").mkString("[", ",", "]")
    if (contended.nonEmpty)
      System.err.println(s"[scale] CONTENDED passes ${contended.mkString(",")}: " +
        s"sentinels $sentJson — treat this artifact as suspect and re-run")
    if (ioContended.nonEmpty)
      System.err.println(s"[scale] IO-CONTENDED segments ${ioContended.mkString(",")} " +
        s"(io sentinels $ioJson)" +
        (if (ioContaminated.nonEmpty)
           s"; points with NO clean sample (all-sample median kept): ${ioContaminated.mkString(",")}"
         else "; every point retained at least one clean sample"))
    println(s"""[scalejson] {"sf":"$dir","runs":$runs,"sentinel":$sentJson,""" +
      s""""io_sentinel":$ioJson,""" +
      s""""contended_passes":${contended.mkString("[", ",", "]")},""" +
      s""""io_contended_segments":${ioContended.mkString("[", ",", "]")},""" +
      s""""io_contaminated":$ioContamJson,""" +
      s""""families":$families}""")
  }
}
