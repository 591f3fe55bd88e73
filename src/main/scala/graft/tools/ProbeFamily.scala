package graft.tools

import graft.functions.{Dedup, IvfIndex, Similarity, TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Dev diagnostic: time ONE smoke family at one factor in a fresh JVM —
  * for adjudicating whether a deep-factor ScaleSmoke point reflects the
  * operator or accumulated JVM state (heap churn, code-cache pressure)
  * from the families that ran before it in the same process.
  * `runMain graft.tools.ProbeFamily <smokeDir> <family> <factor> [reps]` */
object ProbeFamily {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val smokeDir = args(0)
    val family = args(1)
    val n = args(2).toInt
    val reps = if (args.length > 3) args(3).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // source-dataset key for /tmp caches: replicas of DIFFERENT SF dirs
    // must never collide (a factor-keyed-only cache silently reused stale
    // replicas after an SF_DIR switch)
    val sfKey = Integer.toHexString(sfDir.hashCode)
    // Hadoop FS existence check: smokeDir/caches may be any Hadoop path,
    // not just local files
    def success(p: String): Boolean = {
      val path = new org.apache.hadoop.fs.Path(s"$p/_SUCCESS")
      path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
    }
    // docs_x$n replicas: reuse a prior ScaleSmoke materialization if the
    // caller pointed smokeDir at one, else materialize once under /tmp —
    // ONE loading path for every family (the pre-existing families used
    // to hard-require a prior materialization)
    def probeDocs() = {
      val path = s"$smokeDir/docs_x$n"
      if (success(path)) spark.read.parquet(path)
      else {
        val cached = s"/tmp/graft_probe_docs_${sfKey}_x$n"
        if (!success(cached))
          ScaleSmoke.replicateDocsDistinct(
            graft.Tables.documents(spark, sfDir).select("doc_id", "text"), n)
            .write.mode("overwrite").parquet(cached)
        spark.read.parquet(cached)
      }
    }
    lazy val docs = probeDocs()
    // A/B lever for the InferFiltersFromGenerate re-derive trap: a family
    // suffixed `_noinfer` runs the same body with the rule excluded, so a
    // probe pair attributes the cost of synthesized size/isnotnull scan
    // filters that predicate pushdown rewrites into extra evaluations of
    // the aliased kernel (explode over a projected attribute — the p51
    // bigramSets lesson; p33/p37/p52 carry the same shape on the
    // shingle/signature kernels)
    // `_infer` re-ENABLES the generate rule (GraftSession now excludes
    // it); `_noconstraints` ADDITIONALLY excludes
    // InferFiltersFromConstraints — only a measurement lever (that rule's
    // join-key isnotnulls are valuable in general): it isolates the cost
    // of inferred isnotnulls over DERIVED kernel columns
    // (isnotnull(sqrt(vec_dot(e,e))) at the scan, found by KernelAudit on
    // p13/p49/p6)
    val ruleOf = Map(
      "_noinfer" -> "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
      "_infer" -> "",
      "_noconstraints" ->
        ("org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate," +
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints"))
    val (familyBase, lever) = ruleOf.keys.find(family.endsWith)
      .map(s => (family.dropRight(s.length), Some(ruleOf(s))))
      .getOrElse((family, None))
    lever.foreach(spark.conf.set("spark.sql.optimizer.excludedRules", _))
    // per-rep stage + shuffle-write + task-time accounting: the decisive
    // evidence for recompute-vs-reuse questions (a 3x-referenced subtree
    // that does NOT stage-reuse shows up as ~3x the shuffle bytes of its
    // single run, invisible in wall time on a page-cached local disk);
    // executorDeserializeTime isolates task-binary deserialization —
    // where a boxed plan literal bills (the assign_literal_tax family)
    val stages = new java.util.concurrent.atomic.AtomicLong
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        deserMs.addAndGet(sc.stageInfo.taskMetrics.executorDeserializeTime)
        runMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    // a real drain, not a fixed sleep: under load, stage/shuffle events
    // posted late would bleed into the next window and skew the A/B
    // accounting this tool exists to provide. LiveListenerBus
    // .waitUntilEmpty is private[spark] (public bytecode), so reflect —
    // dev tool, same pattern as the DebeziumRuntime public-API loader
    def drainBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", java.lang.Long.TYPE)
        .invoke(bus, java.lang.Long.valueOf(30000L))
    }
    // per-PHASE accounting inside one family run (multi-phase families:
    // assign_literal_tax) — wall time plus the deser/run task split
    def phase(tag: String)(f: => Long): Long = {
      val (d0, r0, st0) = (deserMs.get, runMs.get, stages.get)
      val t0 = System.nanoTime()
      val s = f
      val secs = (System.nanoTime() - t0) / 1e9
      drainBus()
      println(f"[phase] $family x$n $tag $secs%.2f s sum=$s " +
        f"deser_s=${(deserMs.get - d0) / 1e3}%.2f " +
        f"run_s=${(runMs.get - r0) / 1e3}%.2f stages=${stages.get - st0}")
      s
    }
    def run(): Long = familyBase match {
      case "tfidf_topk" =>
        TF.tfidfTopK(docs.withColumn("_ws", TF.words(TF.normText(col("text")))),
          col("_ws"), 3).count()
      // pre-r11 tf shape (exploded (doc, word) groupBy — the corpus-sized
      // exchange the word_term_counts kernel removed), for A/B attribution
      case "tfidf_topk_oldtf" =>
        val d = docs.withColumn("_ws", TF.words(TF.normText(col("text"))))
        val tf = d.select(col("doc_id"), explode(col("_ws")).as("word"))
          .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy("word").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("word"))
        tf.join(dfT, "word").withColumn("score", expr("tf * 1000000L div df"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .where(col("rk") <= 3).count()
      case "substring_overlap" => Dedup.substringOverlapPairs(docs, 48, 2L).count()
      case "minhash_lsh" => Dedup.minhashLsh(docs, 8, 800).count()
      case "contam_bloom" =>
        val sh = Dedup.shingleArrays(docs)
        val train = sh.where(pmod(col("sid"), lit(20)) =!= 0)
          .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
        val test = sh.where(pmod(col("sid"), lit(20)) === 0)
          .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
        Dedup.contaminationPairs(train, test, 3L).count()
      case "line_dedup" =>
        Dedup.lineDedup(docs, 2L, delim = " ")
          .agg(sum(col("kept_lines") + length(col("new_text")))).head().getLong(0)
      case "span_scrub" =>
        Dedup.duplicateSpanScrub(docs, 48, 2L)
          .agg(sum(col("covered_chars") + length(col("scrubbed_md5")))).head().getLong(0)
      // verdict-stage A/B: the pre-r11 shape (positioned stream,
      // distinct-(doc,wh) then groupBy(wh) — two corpus-sized shuffles)
      // vs the r11 shape (per-doc-distinct kernel, one partial-agg'd
      // shuffle) — for attributing span_scrub smoke movement to the stage
      case "span_verdict_old" =>
        docs.select(col("doc_id"),
            explode(call_function("anchor_window_pos_hashes", col("text"), lit(48)))
              .as("_pw"))
          .select(col("doc_id"), col("_pw.wh").as("_wh"))
          .distinct()
          .groupBy(col("_wh")).agg(count(lit(1)).as("_docs"))
          .where(col("_docs") >= 2).count()
      case "span_verdict_new" =>
        docs.select(col("doc_id"),
            explode(call_function("anchor_window_hashes", col("text"), lit(48)))
              .as("_wh"))
          .groupBy(col("_wh")).agg(count(lit(1)).as("_docs"))
          .where(col("_docs") >= 2).count()
      case "activity_exact" =>
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
        graft.functions.Similarity.activityCosineTopK(
          ev, "user_id", "ts_us", 3600000000L, col("user_id") < 20, 3).count()
      case "activity_lsh" =>
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
        graft.functions.Similarity.activityCosineTopKLsh(
          ev, "user_id", "ts_us", 3600000000L, col("user_id") < 20, 3).count()
      case "semdedup" =>
        // capped k, mirroring the smoke's index+increment posture: the
        // r14 uncap experiment (k = 16·n) flattened the scan but
        // regressed the increment probe 2.2x — nearest_cell assignment
        // is exact over all k cells, so per-batch cost grows with k
        // (see the deepSuite comment; SemKnProbe records both regimes).
        // k in the cache key so regime experiments never silently reuse
        // a differently-trained index
        val kCap = math.min(16 * n, 512)
        val semIdxPath = s"/tmp/graft_sem_idx_${sfKey}_k${kCap}_x$n"
        if (!success(semIdxPath)) {
          val embsN = ScaleSmoke.replicateEmbsRotated(
            graft.Tables.embeddings(spark, sfDir), n)
          val model = graft.functions.IvfIndex.train(embsN,
            k = kCap, iters = 3)
          println(s"[probe] semdedup model trained k=${model.k}")
          graft.functions.IvfIndex.index(embsN, model)
            .write.mode("overwrite").parquet(semIdxPath)
        }
        graft.functions.Similarity.semDedupOnIndex(
            spark.read.parquet(semIdxPath), 450000L)
          .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0)
      case "semdedup_cells" =>
        // cell-population diagnostic for the semdedup family: train the
        // factor's codebook, report the cell-size distribution and the
        // within-cell pair volume the pair scan will pay
        val embsN = ScaleSmoke.replicateEmbsRotated(
          graft.Tables.embeddings(spark, sfDir), n)
        val model = graft.functions.IvfIndex.train(embsN,
          k = math.min(16 * n, 512), iters = 3)
        val sizes = graft.functions.IvfIndex.index(embsN, model)
          .groupBy("cell").count()
        val top = sizes.orderBy(col("count").desc).limit(10).collect()
          .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
        val pairs = sizes.agg(sum(col("count") * col("count"))).head().getLong(0)
        println(s"[probe] semdedup_cells x$n k=${model.k} " +
          s"cells=${sizes.count()} pairSum=$pairs top=$top")
        pairs
      case "cms_heavy_hitters" =>
        val tok = probeDocs().select(
          explode(TF.words(TF.normText(col("text")))).as("_w"))
        val cells = graft.functions.Sketches.cmsPartial(tok, col("_w"))
        graft.functions.Sketches.cmsEstimate(tok.distinct(), "_w", cells)
          .agg(sum(col("est_cnt"))).head().getLong(0)
      case "bigram_lm" =>
        TF.bigramLmScore(docs)
          .agg(sum(col("score_ppm") + col("n_bigrams"))).head().getLong(0)
      // the REJECTED word_term_counts variant (kept for the A/B record
      // the bigramLmScore scaladoc cites): bigram within-doc tf is ~1,
      // so the kernel's per-row map roughly doubled the x1 scan cost
      // for ~10% fewer join-back rows — measured 3.9-8.9 s here vs
      // 2.1-3.2 s exploded at x1 warm, 4.3 vs 5.0 s at x10
      case "bigram_lm_wtc" =>
        val bg = docs.select(col("doc_id"),
            explode(call_function("word_term_counts",
              TF.bigrams(TF.words(TF.normText(col("text")))))).as("_wt"))
          .select(col("doc_id"), col("_wt.word").as("_bg"), col("_wt.tf").as("_tf"))
        val c2 = bg.groupBy(col("_bg")).agg(sum(col("_tf")).as("_n2"))
        val c1 = c2.groupBy(substring_index(col("_bg"), " ", 1).as("_w1"))
          .agg(sum(col("_n2")).as("_n1"))
        val model = c2.join(c1, substring_index(col("_bg"), " ", 1) === col("_w1"))
          .select(col("_bg"), expr("_n2 * 1000000 div _n1").as("_ppm"))
        val perDoc = bg.join(model, "_bg").groupBy(col("doc_id"))
          .agg(sum(col("_tf")).as("n_bigrams"),
            sum(col("_tf") * col("_ppm")).as("_s"))
        docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(expr("_s div n_bigrams"), lit(0L)).as("score_ppm"))
          .agg(sum(col("score_ppm") + col("n_bigrams"))).head().getLong(0)
      case "vocab_coverage" =>
        TF.vocabCoverage(docs, 100)
          .agg(sum(col("oov_milli") + col("mean_rank_centi"))).head().getLong(0)
      // pre-r12 shape (token-occurrence explode on both the vocab build
      // and the coverage probe side)
      case "vocab_coverage_old" =>
        import org.apache.spark.sql.expressions.Window
        val base = docs.withColumn("_ws", TF.words(TF.normText(col("text"))))
        val toks = base.select(col("doc_id"), explode(col("_ws")).as("_word"))
        val ranked = toks.groupBy("_word").agg(count(lit(1)).as("_cnt"))
          .orderBy(col("_cnt").desc, col("_word")).limit(100)
          .select(col("_word"), row_number().over(
            Window.orderBy(col("_cnt").desc, col("_word"))).cast("long").as("_rank"))
        base.select(col("doc_id"), explode_outer(col("_ws")).as("_word"))
          .join(broadcast(ranked), Seq("_word"), "left")
          .groupBy(col("doc_id"))
          .agg(count(col("_word")).as("tok_cnt"),
            count(col("_rank")).as("in_vocab"),
            coalesce(sum("_rank"), lit(0L)).as("_rank_sum"))
          .select(
            ((col("tok_cnt") - col("in_vocab")) * 1000 / greatest(col("tok_cnt"), lit(1L)))
              .cast("long").as("oov_milli"),
            (col("_rank_sum") * 100 / greatest(col("in_vocab"), lit(1L)))
              .cast("long").as("mean_rank_centi"))
          .agg(sum(col("oov_milli") + col("mean_rank_centi"))).head().getLong(0)
      case "ngram_novelty" =>
        TF.ngramNovelty(probeDocs())
          .agg(sum(col("novel_cnt") + col("novelty_pm"))).head().getLong(0)
      // LAZY composition twin (r14): bigramSets ∘ ngramNoveltyOfSets with
      // no persist/repartition. The r13 inline revert was measured BEFORE
      // GraftSession excluded InferFiltersFromGenerate session-wide —
      // under the exclusion the synthesized size filter (the third
      // derive) cannot appear, so this should now be plan-identical to
      // the inline form; pair with `_infer` to re-measure the trap side
      case "ngram_novelty_lazy" =>
        TF.ngramNoveltyOfSets(TF.bigramSets(probeDocs()))
          .agg(sum(col("novel_cnt") + col("novelty_pm"))).head().getLong(0)
      // single-scan candidate (r13): PERSIST the (id, bigram-set)
      // projection so both branches read the cache instead of scanning
      // and re-deriving the bigram arrays twice — would delete the
      // production shape's documented x1 two-scan cost IF the cache
      // write+read beats the second derive; at corpus scale the
      // projection (~2x text bytes) spills to disk, so this is exactly
      // the measure-first trade
      case "ngram_novelty_cached" =>
        val proj = TF.bigramSets(probeDocs())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try TF.ngramNoveltyOfSets(proj)
          .agg(sum(col("novel_cnt") + col("novelty_pm"))).head().getLong(0)
        finally proj.unpersist(false)
      // scale-safe single-derive candidate (r13): same idea as _cached
      // but the projection rides ONE id-keyed exchange instead of the
      // storage fraction — AQE stage-reuse dedups the twice-referenced
      // shuffle subtree (the p54 mechanism), so the bigram arrays are
      // derived once and spill like any shuffle at 100 TB
      case "ngram_novelty_shuffled" =>
        TF.ngramNoveltyOfSets(
            TF.bigramSets(probeDocs()).repartition(col("doc_id")))
          .agg(sum(col("novel_cnt") + col("novelty_pm"))).head().getLong(0)
      // pre-r12 shape (global (doc, bigram) distinct exchange + id-keyed
      // perDoc count), for A/B attribution of the kernel fast path
      case "ngram_novelty_old" =>
        val bg = docs.select(col("doc_id").as("_id"),
            explode(TF.bigrams(TF.words(TF.normText(col("text"))))).as("_bg"))
          .distinct()
        val perDoc = bg.groupBy(col("_id")).agg(count(lit(1)).as("n_bigrams"))
        val novel = bg.groupBy(col("_bg")).agg(min(col("_id")).as("_first"))
          .groupBy(col("_first")).agg(count(lit(1)).as("novel_cnt"))
        docs.select(col("doc_id"))
          .join(perDoc, col("doc_id") === col("_id"), "left")
          .join(novel, col("doc_id") === col("_first"), "left")
          .select(
            coalesce(col("novel_cnt"), lit(0L)).as("novel_cnt"),
            when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
              .otherwise(expr("(coalesce(novel_cnt, 0L) * 1000) div n_bigrams"))
              .cast("long").as("novelty_pm"))
          .agg(sum(col("novel_cnt") + col("novelty_pm"))).head().getLong(0)
      case "dsir" =>
        TF.dsirScores(docs, pmod(col("doc_id"), lit(5)) === 0)
          .agg(sum(abs(col("score_ppm")) + col("n_tokens"))).head().getLong(0)
      // pre-r12 shape (one row per token OCCURRENCE through the vocab
      // build and the model join-back)
      case "dsir_old" =>
        val tok = docs.select(col("doc_id"),
          (pmod(col("doc_id"), lit(5)) === 0).cast("long").as("_tgt"),
          explode(TF.words(TF.normText(col("text")))).as("_w"))
        val vocab = tok.groupBy(col("_w"))
          .agg(count(lit(1)).as("_cr"), sum(col("_tgt")).as("_ct"))
        val totals = vocab.agg(sum(col("_cr")).as("_nr"),
          sum(col("_ct")).as("_nt"), count(lit(1)).as("_v"))
        val model = vocab.crossJoin(broadcast(totals))
          .select(col("_w"),
            (expr("((_ct + 1) * 1000000) div (_nt + _v)") -
              expr("((_cr + 1) * 1000000) div (_nr + _v)")).as("_delta"))
        val perDoc = tok.join(model, "_w").groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("_delta")).as("_s"))
        docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("_s"), lit(0L)).as("score_ppm"))
          .agg(sum(abs(col("score_ppm")) + col("n_tokens"))).head().getLong(0)
      case "containment_scan" =>
        Dedup.containmentScan(probeDocs(), 200).count()
      // r15 root-cause kit for the x400 super-linearity (4.48x per 4x
      // data vs 3.1-3.5x for the shingle-join peers) — RESOLVED: join
      // output is exactly linear (11.4M -> 45.6M rows for 4x; word-
      // tagged replicas share no shingles, so no densification); the
      // drift was the then-production merge hint SORTING the corpus-
      // sized exploded train side. Production now builds a shuffled
      // hash on the 5% test side (_hash twin == production shape):
      // merge 4.93 -> 16.85 s (3.42x/4x) vs hash 3.81 -> 11.53 (3.03x).
      // Stage attribution twins below: the explode volume alone, then
      // the raw join.
      case "containment_explode" =>
        val sh = Dedup.shingleArrays(probeDocs())
          .withColumn("_bucket", TF.splitBucket(col("sid")))
        val train = sh.where(col("_bucket") < 90)
          .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
        val test = sh.where(col("_bucket") >= 95)
          .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
        train.unionAll(test).count()
      // join-output volume: if THIS curve is linear in the factor while
      // the timed op is super-linear, the drift is strategy/spill, not
      // pair blow-up (replicas are word-tagged — cross-replica sharing
      // is impossible by construction)
      case "containment_join_rows" =>
        val sh = Dedup.shingleArrays(probeDocs())
          .withColumn("_bucket", TF.splitBucket(col("sid")))
        val train = sh.where(col("_bucket") < 90)
          .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
        val test = sh.where(col("_bucket") >= 95)
          .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
        train.join(test, Seq("sh")).count()
      // strategy A/B twins: the REJECTED merge-hinted form (pre-r15
      // production) vs the shuffled-hash join BUILDING ON THE TEST SIDE
      // (5% of the corpus — the explode stays unsorted, the big side
      // streams; the production shape since r15)
      case "containment_scan_smj" =>
        Dedup.containmentScanImpl(probeDocs(), 200, "doc_id", "text",
          trainHint = Some("merge"), testHint = None).count()
      case "containment_scan_hash" =>
        Dedup.containmentScanImpl(probeDocs(), 200, "doc_id", "text",
          trainHint = None, testHint = Some("shuffle_hash")).count()
      // no hint at all: what does the planner pick off Generate estimates?
      case "containment_scan_nohint" =>
        Dedup.containmentScanImpl(probeDocs(), 200, "doc_id", "text",
          trainHint = None, testHint = None).count()
      // p13's shape at probe factors: exact cosine near-dup pair scan
      // (prep runs in-query — the isnotnull(sqrt(vec_dot)) scan-filter
      // candidate KernelAudit flagged)
      case "embed_pairs" =>
        val embsN = ScaleSmoke.replicateEmbsRotated(
          graft.Tables.embeddings(spark, sfDir), n)
        graft.functions.Similarity.cosineNearDupPairs(embsN, 450000L).count()
      // p6's shape: exhaustive n-gram Jaccard (isnotnull(size(shingles))
      // scan-filter candidate)
      case "ngram_jaccard" =>
        Dedup.ngramJaccardPairs(docs, 500).count()
      // p12's shape at probe factors: train + index + probe-cell knn
      case "ivf_knn" =>
        val embsN = ScaleSmoke.replicateEmbsRotated(
          graft.Tables.embeddings(spark, sfDir), n)
        val model = graft.functions.IvfIndex.train(embsN,
          k = math.min(16 * n, 512), iters = 3)
        graft.functions.IvfIndex.knn(embsN, model,
          col("vec_id") < 20, 5, nprobe = 2).count()
      // p37's shape at probe factors: in-query index + increment probe
      case "cross_corpus" =>
        val newDocs = docs.where(pmod(col("doc_id"), lit(4)) === 0)
        val oldIdx = Dedup.lshIndex(docs.where(pmod(col("doc_id"), lit(4)) =!= 0), 8)
        Dedup.crossCorpusPairs(newDocs, oldIdx, 8, 800).count()
      case "collocations" =>
        TF.collocations(probeDocs(), 5L, 50)
          .agg(sum(col("pmi_ppm"))).head().getLong(0)
      case "bpe_pairs" =>
        TF.bpePairStats(probeDocs(), 40)
          .agg(sum(col("cnt"))).head().getLong(0)
      case "minhash_estimate" =>
        Dedup.minhashJaccardEstimate(probeDocs(), 8, 500)
          .agg(sum(col("est_milli") + col("jacc_milli"))).head().getLong(0)
      // attribution: ONE corpus-wide shingle pass (norm+split+trigram
      // kernel, no minhash) — the unit the verify sides of minhash_lsh /
      // minhash_estimate each re-pay when they re-derive shingle arrays
      // from the raw docs instead of pruning to candidates first
      case "shingle_pass" =>
        Dedup.shingleArrays(docs)
          .agg(sum(size(col("shs")))).head().getLong(0)
      // attribution: shingles + the minhash_bands kernel (the signature
      // pass minus the bucket shuffle)
      case "minhash_sig_pass" =>
        Dedup.minhashSignatureRows(Dedup.shingleArrays(docs), 8).count()
      // candidate-pruned verify A/B for minhash_lsh: semi-join the raw
      // docs to the candidate id set BEFORE computing verify-side shingle
      // arrays, so the trigram kernel runs corpus-wide ONCE (signature
      // pass) and candidate-sized twice, instead of corpus-wide three
      // times. Output identical (inner joins on cands either way); the
      // question is whether the 3x-referenced cands subtree reuses its
      // exchanges or recomputes the signature pass per reference.
      case "minhash_lsh_pruned" =>
        val shArr = Dedup.shingleArrays(docs)
        val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatureRows(shArr, 8))
        def side(idCol: String) = Dedup.shingleArrays(
          docs.join(cands.select(col(idCol).as("doc_id")).distinct(),
            Seq("doc_id"), "left_semi"))
        val a = side("doc_a").select(col("sid").as("doc_a"), col("shs").as("shs_a"))
        val b = side("doc_b").select(col("sid").as("doc_b"), col("shs").as("shs_b"))
        val out = cands.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            size(array_intersect(col("shs_a"), col("shs_b"))).cast("long").as("inter"),
            size(col("shs_a")).cast("long").as("na"),
            size(col("shs_b")).cast("long").as("nb"))
          .withColumn("jacc_milli",
            floor(lit(1000.0) * col("inter") / (col("na") + col("nb") - col("inter"))).cast("long"))
          .where(col("jacc_milli") >= 800)
        val n0 = out.count()
        // the reuse question decides whether this shape is safe at scale:
        // the cands subtree is referenced three times (verify driver +
        // two semi-join prunes) — without exchange/stage reuse the
        // signature pass would run three times. Dump the FINAL adaptive
        // plan (executedPlan.toString pre-execution shows isFinalPlan=false);
        // with AQE off there is no adaptive wrapper — dump the raw plan
        val fin = out.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.treeString
          case p => p.treeString
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get("/tmp/probe_lsh_pruned_plan.txt"),
          fin.getBytes("UTF-8"))
        def cnt(pat: String) = pat.r.findAllIn(fin).size
        println(s"[probe] minhash_lsh_pruned reused_shuffle=${cnt("ReusedQueryStage|ReusedExchange")} " +
          s"shuffle_stages=${cnt("ShuffleQueryStage")} generates=${cnt("Generate ")}")
        n0
      // pre-r12 estimator shape (corpus-wide component arrays on BOTH
      // verify sides — the minhash kernel three times over the corpus),
      // kept for A/B attribution of the candidate-pruned production path
      // (measured 16.6 vs 11.5 s min-of-4 at x100 in the same window)
      case "minhash_estimate_unpruned" =>
        val shArr = Dedup.shingleArrays(docs)
        val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatureRows(shArr, 8))
        val comp = shArr.select(col("sid"),
          Dedup.mhComponentsCol(col("shs"), 8, shArr.sparkSession).as("mhs"),
          col("shs"))
        val a = comp.select(col("sid").as("doc_a"),
          col("mhs").as("mhs_a"), col("shs").as("shs_a"))
        val b = comp.select(col("sid").as("doc_b"),
          col("mhs").as("mhs_b"), col("shs").as("shs_b"))
        cands.join(a, "doc_a").join(b, "doc_b")
          .withColumn("_m", aggregate(
            zip_with(col("mhs_a"), col("mhs_b"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v))
          .withColumn("est_milli", expr(s"(_m * 1000) div ${8 * Dedup.RowsPerBand}"))
          .where(col("est_milli") >= 500)
          .withColumn("_i",
            size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
          .withColumn("jacc_milli",
            floor(lit(1000.0) * col("_i") /
              (size(col("shs_a")) + size(col("shs_b")) - col("_i"))).cast("long"))
          .agg(sum(col("est_milli") + col("jacc_milli"))).head().getLong(0)
      // third estimator shape: the OLD 7-stage topology (no semi-join
      // barriers) with the component kernel moved POST-JOIN — sides carry
      // only shingle arrays (cheap trigram pass), and the 16-md5 kernel
      // runs once corpus-wide (signature pass) plus twice PER CANDIDATE
      // PAIR (same per-pair complexity class as the array_intersect the
      // verify already pays)
      case "minhash_estimate_pairkernel" =>
        val shArr = Dedup.shingleArrays(docs)
        val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatureRows(shArr, 8))
        val a = shArr.select(col("sid").as("doc_a"), col("shs").as("shs_a"))
        val b = shArr.select(col("sid").as("doc_b"), col("shs").as("shs_b"))
        cands.join(a, "doc_a").join(b, "doc_b")
          .withColumn("mhs_a", Dedup.mhComponentsCol(col("shs_a"), 8, spark))
          .withColumn("mhs_b", Dedup.mhComponentsCol(col("shs_b"), 8, spark))
          .withColumn("_m", aggregate(
            zip_with(col("mhs_a"), col("mhs_b"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v))
          .withColumn("est_milli", expr(s"(_m * 1000) div ${8 * Dedup.RowsPerBand}"))
          .where(col("est_milli") >= 500)
          .withColumn("_i",
            size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
          .withColumn("jacc_milli",
            floor(lit(1000.0) * col("_i") /
              (size(col("shs_a")) + size(col("shs_b")) - col("_i"))).cast("long"))
          .agg(sum(col("est_milli") + col("jacc_milli"))).head().getLong(0)
      case "activity_hist_wide" =>
        // the routed histogram builder at bins=168 (hour-of-week): past
        // spark.sql.codegen.maxFields the public API goes through the
        // two-step composition — keeps the r13 routing measurement
        // (20M cached events: two-step 1.5 s vs fused-interpreted
        // 3.4-3.6 s) reproducible per round
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
        // fold the whole array (count() would prune the agg columns, and
        // element_at a CreateArray collapses to one conditional sum)
        graft.functions.Similarity.activityHistogramsFromEvents(
            ev, "user_id", "ts_us", 3600000000L, bins = 168)
          .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
          .head().getLong(0)
      // 24-bin A/B: is the codegen'd fused form still the right default
      // under the codegen field limit, or should bin_count_agg take over
      // everywhere? (the public builder keeps fused at <= maxFields)
      case "activity_hist24" =>
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
        graft.functions.Similarity.activityHistogramsFromEvents(
            ev, "user_id", "ts_us", 3600000000L, bins = 24)
          .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
          .head().getLong(0)
      case "activity_hist24_kernel" =>
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
        val hourUs = 3600000000L
        val bin = pmod(
          expr(s"((ts_us) - pmod(ts_us, $hourUs)) div $hourUs"), lit(24))
        ev.groupBy(col("user_id"))
          .agg(call_function("bin_count_agg", bin, lit(24)).as("hist"))
          .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
          .head().getLong(0)
      // DENSE-regime twins (keys collapsed to 64, so events-per-key ≫
      // bins): the regime where the two-step composition originally beat
      // the fused form — closes the loop on the kernel routing claim
      // ("wins both regimes") with a measurement instead of reasoning
      case "activity_hist_wide_dense" =>
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
          .withColumn("user_id", pmod(col("user_id"), lit(64)))
        graft.functions.Similarity.activityHistogramsFromEvents(
            ev, "user_id", "ts_us", 3600000000L, bins = 168)
          .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
          .head().getLong(0)
      case "activity_hist_wide_dense_twostep" =>
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
          .withColumn("user_id", pmod(col("user_id"), lit(64)))
        graft.functions.Similarity.activityHistograms(
            graft.functions.Similarity.activityCells(
              ev, "user_id", "ts_us", 3600000000L, bins = 168), "user_id", 168)
          .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
          .head().getLong(0)
      // measurement-record twin: the two-step cells composition at
      // bins=168 — r13's first routing target, REJECTED for sparse
      // activity once probes showed its keys×bins cell exchange exceeds
      // the corpus (222 vs 40 MB at ×100); kept for A/B against the
      // bin_count_agg kernel the public builder now routes to
      case "activity_hist_wide_twostep" =>
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
        graft.functions.Similarity.activityHistograms(
            graft.functions.Similarity.activityCells(
              ev, "user_id", "ts_us", 3600000000L, bins = 168), "user_id", 168)
          .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
          .head().getLong(0)
      case "activity_hist_wide_fused" =>
        // measurement-record twin: the fused 168-conditional-sum aggregate
        // the routing REJECTED (the stage drops out of codegen past
        // maxFields=100) — inlined here because the public builder now
        // routes around it; output is parity-pinned in PipelineSpec
        val ev = ScaleSmoke.replicateEvents(graft.Tables.events(spark, sfDir), n)
        val hourUs = 3600000000L
        val bin = pmod(
          expr(s"((ts_us) - pmod(ts_us, $hourUs)) div $hourUs"), lit(168))
        ev.groupBy(col("user_id"))
          .agg(array((0 until 168).map(h =>
            coalesce(sum(when(bin === h, 1L)), lit(0L))): _*).as("hist"))
          .agg(sum(aggregate(col("hist"), lit(0L), (a, x) => a + x)))
          .head().getLong(0)
      // r15 adjudicated probe, folded in as a labeled family (finding
      // recorded in CodebookCodec's scaladoc + VERDICT r15: the boxed
      // codebook literal billed more in stage serialization + task
      // deserialization + plan canonicalization than all task work —
      // the deser_s column is the smoking gun). Times the 2000-vector
      // batch assignment and the full SemDeDup increment per model
      // route against a literal-free baseline. Requires the
      // /tmp/graft_semkn_* artifacts a prior SemKnProbe run at the
      // same factor materializes.
      case "assign_literal_tax" =>
        def batch = graft.Tables.embeddings(spark, sfDir)
          .select((col("vec_id") + lit(990000000L)).as("vec_id"),
            col("embedding"), col("label"))
        val capped = IvfIndex.loadModel(
          s"/tmp/graft_semkn_${n}_${math.min(16 * n, 512)}/model")(spark)
        val kn = IvfIndex.loadModel(s"/tmp/graft_semkn_${n}_${16 * n}/model")(spark)
        val two = IvfIndex.loadModel2(s"/tmp/graft_semkn_${n}_two${16 * n}/model")(spark)
        var acc = 0L
        acc += phase("baseline")(batch.agg(sum(col("vec_id"))).head().getLong(0))
        acc += phase("capped")(IvfIndex.index(batch, capped)
          .agg(sum(col("cell"))).head().getLong(0))
        acc += phase("k16n")(IvfIndex.index(batch, kn)
          .agg(sum(col("cell"))).head().getLong(0))
        acc += phase("two")(IvfIndex.index2(batch, two)
          .agg(sum(col("cell"))).head().getLong(0))
        def incr(tag: String, idxPath: String,
                 f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
          acc += phase(s"incr_$tag") {
            f(spark.read.parquet(idxPath))
              .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell")))
              .head().getLong(0)
          }
          spark.catalog.clearCache()
        }
        incr("capped", s"/tmp/graft_semkn_${n}_${math.min(16 * n, 512)}/idx",
          idx => Similarity.semDedupIncrement(idx, batch, capped, 450000L))
        incr("k16n", s"/tmp/graft_semkn_${n}_${16 * n}/idx",
          idx => Similarity.semDedupIncrement(idx, batch, kn, 450000L))
        incr("two", s"/tmp/graft_semkn_${n}_two${16 * n}/idx",
          idx => Similarity.semDedupIncrement2(idx, batch, two, 450000L))
        acc
      // r15 adjudicated probe, folded in as a labeled family (the
      // recall numbers behind IvfIndex.knn2's scaladoc; the ordering is
      // now ALSO pinned deterministically by Knn2RecallSpec): recall@k
      // of the three ANN routes vs exact brute force over rotated
      // replicas — capped flat book, k∝n flat book, two-level.
      // Parameters via SPARK_GRAFT_KNN_{K,NPROBE,CP} (defaults 10/8/4).
      case "knn_recall" =>
        import spark.implicits._
        val k = sys.env.get("SPARK_GRAFT_KNN_K").map(_.toInt).getOrElse(10)
        val nprobe = sys.env.get("SPARK_GRAFT_KNN_NPROBE").map(_.toInt).getOrElse(8)
        val cp = sys.env.get("SPARK_GRAFT_KNN_CP").map(_.toInt).getOrElse(4)
        val embsN = ScaleSmoke.replicateEmbsRotated(
          graft.Tables.embeddings(spark, sfDir), n)
        val pred = col("vec_id") < 20
        def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
          df.select("q_id", "n_id").as[(Long, Long)].collect()
            .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
        var exact: Map[Long, Set[Long]] = Map.empty
        phase("brute") {
          exact = topSets(Similarity.bruteKnn(embsN, pred, k)); exact.size.toLong
        }
        def recall(ann: Map[Long, Set[Long]]): Double = {
          val per = exact.map { case (q, ex) =>
            ann.getOrElse(q, Set.empty).count(ex).toDouble / ex.size
          }
          per.sum / per.size
        }
        val capped = IvfIndex.train(embsN, k = math.min(16 * n, 512), iters = 3)
        var cappedTop: Map[Long, Set[Long]] = Map.empty
        phase(s"flat_capped k=${capped.k} nprobe=$nprobe") {
          cappedTop = topSets(IvfIndex.knn(embsN, capped, pred, k, nprobe))
          cappedTop.size.toLong
        }
        val kn = IvfIndex.train(embsN, k = 16 * n, iters = 3,
          maxTrainVectors = math.max(1 << 16, 16 * n))
        var knTop: Map[Long, Set[Long]] = Map.empty
        phase(s"flat_kn k=${kn.k} nprobe=$nprobe") {
          knTop = topSets(IvfIndex.knn(embsN, kn, pred, k, nprobe))
          knTop.size.toLong
        }
        val m2 = IvfIndex.trainTwoLevel(embsN, kTotal = 16 * n, iters = 3)
        var twoTop: Map[Long, Set[Long]] = Map.empty
        phase(s"two k=${m2.k} coarse=${m2.coarse.k} cp=$cp nprobe=$nprobe") {
          twoTop = topSets(IvfIndex.knn2(embsN, m2, pred, k, nprobe, cp))
          twoTop.size.toLong
        }
        println(f"[recall] x$n k=$k nprobe=$nprobe coarseProbe=$cp " +
          f"flat_capped=${recall(cappedTop)}%.3f flat_kn=${recall(knTop)}%.3f " +
          f"two=${recall(twoTop)}%.3f")
        // recall@k in permille as the family's comparable scalar
        (recall(twoTop) * 1000).toLong
      case "pq_adc" =>
        // IVF-ADC vs exact-index search at depth: same corpus, same
        // two-level routing (k = 16·n), 20 base queries at
        // nprobe = fineK. Phases report the exact knn2OnIndex route,
        // the ADC route over the compressed index, and the two-stage
        // rerank; the [probe] line reports the stored-index bytes —
        // the 100 TB claim is the size ratio, the recall trade is
        // PqSpec's pin.
        import graft.functions.Pq
        val embsN = ScaleSmoke.replicateEmbsRotated(
          graft.Tables.embeddings(spark, sfDir), n)
        val base = s"/tmp/graft_pq_${sfKey}_x$n"
        if (!success(s"$base/idx") || !success(s"$base/pqidx")) {
          val m2 = IvfIndex.trainTwoLevel(embsN, kTotal = 16 * n, iters = 3)
          IvfIndex.saveModel2(m2, s"$base/model")(spark)
          val pq = Pq.trainPq(embsN, m = 8, ksub = 256, iters = 3)
          Pq.saveModelPq(pq, s"$base/pqmodel")(spark)
          IvfIndex.index2(embsN, m2)
            .write.mode("overwrite").parquet(s"$base/idx")
          Pq.index2Pq(embsN, m2, pq)
            .write.mode("overwrite").parquet(s"$base/pqidx")
        }
        val m2 = IvfIndex.loadModel2(s"$base/model")(spark)
        val pq = Pq.loadModelPq(s"$base/pqmodel")(spark)
        def dirBytes(p: String): Long = {
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
          fs.getContentSummary(path).getLength
        }
        println(s"[probe] pq_adc x$n index bytes exact=${dirBytes(s"$base/idx")} " +
          s"pq=${dirBytes(s"$base/pqidx")} " +
          f"ratio=${dirBytes(s"$base/idx").toDouble / dirBytes(s"$base/pqidx")}%.1f")
        val queries = embsN.where(col("vec_id") < 20)
        val np = math.max(8, m2.k / m2.coarse.k)
        var out = 0L
        phase(s"exact_knn2 np=$np") {
          out = IvfIndex.knn2OnIndex(spark.read.parquet(s"$base/idx"),
            queries, m2, 10, np).count(); out
        }
        phase(s"adc np=$np") {
          out = Pq.knnOnPqIndex(spark.read.parquet(s"$base/pqidx"),
            queries, m2, pq, 10, np).count(); out
        }
        phase(s"adc_rerank np=$np") {
          out = Pq.knnRerank(embsN, spark.read.parquet(s"$base/pqidx"),
            queries, m2, pq, 10, shortlist = 50, nprobe = np).count(); out
        }
        out
      case "bpe_train" =>
        // BPE merge-loop cost at depth: K=30 merges over docs x n.
        // The loop state is the TYPE vocabulary — replicateDocsDistinct
        // word-tags its replicas, so vocab grows ~linearly with n here
        // (the worst case; a real crawl's vocab grows sub-linearly).
        // Expected shape: one corpus-sized vocab build, then K
        // vocab-bounded (pair-agg + rewrite) rounds.
        val t = TF.bpeTrain(probeDocs(), merges = 30)
          .agg(sum(col("freq")), count(lit(1))).head()
        println(s"[probe] bpe_train x$n merges=${t.getLong(1)} " +
          s"freq_sum=${t.getLong(0)}")
        t.getLong(0)
      case "pq_adc_ab" =>
        // A/B the knnOnPqIndex probe-side shape: table projected BELOW
        // the cell explode (current) vs ABOVE it (the pre-r16-review
        // shape). Adjudicated r16: the two are WITHIN WINDOW NOISE at
        // x40 (walls 2.4-7.8 s across reps of both, and even the
        // untouched exact_knn2 phase swung 2.5-6.9 s in the same
        // session — an io/CPU window, the documented afternoon class);
        // below-generate is retained on construction (nprobe x fewer
        // pq_adc_table builds per query, no per-cell recompute), not on
        // a measured wall delta.
        import graft.functions.Pq
        import org.apache.spark.sql.expressions.Window
        val embsN = ScaleSmoke.replicateEmbsRotated(
          graft.Tables.embeddings(spark, sfDir), n)
        val base = s"/tmp/graft_pq_${sfKey}_x$n"
        val m2 = IvfIndex.loadModel2(s"$base/model")(spark)
        val pq = Pq.loadModelPq(s"$base/pqmodel")(spark)
        val queries = embsN.where(col("vec_id") < 20)
        val np = math.max(8, m2.k / m2.coarse.k)
        var out = 0L
        phase(s"below_generate np=$np") {
          out = Pq.knnOnPqIndex(spark.read.parquet(s"$base/pqidx"),
            queries, m2, pq, 10, np).count(); out
        }
        phase(s"above_generate np=$np") {
          val session = spark
          val probes = Similarity.prep(queries, "embedding")
            .withColumn("cell", explode(
              IvfIndex.probeCells2(col("vd"), m2, np, 2, session)))
            .select(col("vec_id").as("q_id"),
              Pq.adcTableCol(col("vd"), pq, session).as("qtab"),
              col("nrm").as("qnrm"), col("cell"))
          val sims = spark.read.parquet(s"$base/pqidx")
            .join(broadcast(probes), Seq("cell"))
            .where(col("q_id") =!= col("vec_id"))
            .select(col("q_id"), col("vec_id").as("n_id"),
              floor(lit(1e6) * Pq.adcScoreCol(col("codes"), col("qtab"), pq, session)
                / (col("qnrm") * col("nrm"))).cast("long").as("sim_adc_micro"))
          val w = Window.partitionBy(col("q_id"))
            .orderBy(col("sim_adc_micro").desc, col("n_id"))
          out = sims.withColumn("rn", row_number().over(w))
            .where(col("rn") <= 10)
            .select(col("q_id"), col("n_id"), col("sim_adc_micro")).count()
          out
        }
        out
      case "sem_contam" =>
        // semantic decontamination at depth: corpus = rotated replicas
        // x n, held-out suite = the 20 base query vectors, book sized
        // k = 16·n (the right-sized regime). Expected shape: the corpus
        // pays one map-side index pass (coarseK + fineK dots/row); the
        // probed-cell broadcast join touches nprobe cells' populations
        // (≈ flat per-cell occupancy under k ∝ n), so the curve should
        // track the scan, never the pair blow-up. Model cached per
        // (sf, n) like the semdedup family.
        val embsN = ScaleSmoke.replicateEmbsRotated(
          graft.Tables.embeddings(spark, sfDir), n)
        val contamModelDir = s"/tmp/graft_contam_m2_${sfKey}_x$n"
        if (!success(contamModelDir)) {
          val m2 = IvfIndex.trainTwoLevel(embsN, kTotal = 16 * n, iters = 3)
          IvfIndex.saveModel2(m2, contamModelDir)(spark)
        }
        val m2 = IvfIndex.loadModel2(contamModelDir)(spark)
        Similarity.semContamination(
            embsN.where(col("vec_id") >= 20), embsN.where(col("vec_id") < 20),
            m2, 350000L, nprobe = math.max(8, m2.k / m2.coarse.k),
            coarseProbe = 2)
          .agg(coalesce(count(lit(1)) + sum(col("sim_micro")), lit(0L)))
          .head().getLong(0)
      case "sem_reseed" =>
        // reseed cost curve: seed the ingest artifact at factor n with a
        // BASE-sized book (kTotal=16 — the outgrown state occupancy()
        // flags), then time SemIngest.reseed to the right-sized book
        // (kTotal = 16·n). Cost anatomy: two-level training is
        // sample-capped (flat past the cap) + one full re-index (linear
        // map-side assignment, no shuffle) + one commit rename. Rep 1
        // pays the outgrown→right-sized transition; later reps retrain
        // at 16·n from the committed generation — the steady-state
        // repeated-reseed cost (min-of-reps reports that).
        val dir = s"/tmp/graft_reseed_${sfKey}_x$n"
        if (!success(s"$dir/vecs/seed")) {
          val embsN = ScaleSmoke.replicateEmbsRotated(
            graft.Tables.embeddings(spark, sfDir), n)
          graft.streaming.SemIngest.seed(embsN, dir, kTotal = 16, coarseK = 4)
        }
        val occBefore = graft.streaming.SemIngest.occupancy(spark, dir)
        graft.streaming.SemIngest.reseed(spark, dir, kTotal = 16 * n)
        val occAfter = graft.streaming.SemIngest.occupancy(spark, dir)
        println(f"[probe] sem_reseed x$n vectors=${occAfter.vectors} " +
          f"mean ${occBefore.mean}%.2f -> ${occAfter.mean}%.2f " +
          f"cells ${occBefore.cells} -> ${occAfter.cells}")
        occAfter.vectors
      case other => sys.error(s"unknown family $other")
    }
    (1 to reps).foreach { i =>
      val (st0, sb0) = (stages.get, shufBytes.get)
      val t0 = System.nanoTime()
      val rows = run()
      val secs = (System.nanoTime() - t0) / 1e9
      drainBus()
      println(f"[probe] $family x$n rep$i $secs%.2f s rows=$rows " +
        f"stages=${stages.get - st0} shuffle_mb=${(shufBytes.get - sb0) / 1e6}%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
