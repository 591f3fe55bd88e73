package graft.tools

import graft._
import graft.functions.{Dedup, IvfIndex, Pq, Similarity, TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 optimization profiler: quantify (a) the single-task scan
  * bottleneck (every sf table is a one-row-group parquet, so all
  * map-side kernel work before the first exchange runs on ONE core) by
  * A/B-ing representative heavy queries against a spread input, and
  * (b) the per-component cost of p59 (trainPq / index2Pq / ADC search).
  * Min-of-N in one JVM — the matched-window device for targeted A/Bs. */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    def minOf(tag: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $tag%-36s min ${ts.min}%.2f s  (all ${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)
    val par = spark.sparkContext.defaultParallelism
    println(s"[prof] defaultParallelism=$par")
    for ((n, df) <- Seq("documents" -> docs, "embeddings" -> embs,
        "events" -> Tables.events(spark, dir), "lineitem" -> Tables.lineitem(spark, dir)))
      println(s"[prof] scan partitions $n = ${df.rdd.getNumPartitions}")

    def spread(df: DataFrame): DataFrame = df.repartition(par)

    // warm-up (JIT + codegen)
    noop(Dedup.ngramJaccardPairs(Tables.documents(spark, "/root/testdata/sf0.001"), 800))

    minOf("p6 ngramJaccardPairs as-is")(noop(Dedup.ngramJaccardPairs(docs, 800)))
    minOf("p6 ngramJaccardPairs spread")(noop(Dedup.ngramJaccardPairs(spread(docs), 800)))
    minOf("p7 minhash as-is")(noop(Dedup.minhashLsh(docs, 8, 800)))
    minOf("p7 minhash spread")(noop(Dedup.minhashLsh(spread(docs), 8, 800)))
    minOf("p51 ngramNovelty as-is")(noop(TF.ngramNovelty(docs)))
    minOf("p51 ngramNovelty spread")(noop(TF.ngramNovelty(spread(docs))))
    minOf("p43 bigramLm as-is")(noop(TF.bigramLmScore(docs)))
    minOf("p43 bigramLm spread")(noop(TF.bigramLmScore(spread(docs))))
    minOf("p54 jaccardEstimate as-is")(noop(Dedup.minhashJaccardEstimate(docs, 8, 500)))
    minOf("p54 jaccardEstimate spread")(noop(Dedup.minhashJaccardEstimate(spread(docs), 8, 500)))

    minOf("p13 cosinePairs as-is")(noop(Similarity.cosineNearDupPairs(embs, 450000L)))
    minOf("p13 cosinePairs spread")(noop(Similarity.cosineNearDupPairs(spread(embs), 450000L)))
    minOf("p22 nearDupClusters as-is")(noop(Dedup.nearDupClusters(docs, 8, 800)))
    minOf("p22 nearDupClusters spread")(noop(Dedup.nearDupClusters(spread(docs), 8, 800)))
    minOf("p46 spanScrub as-is")(noop(Dedup.duplicateSpanScrub(docs, 48, 2L)))
    minOf("p46 spanScrub spread")(noop(Dedup.duplicateSpanScrub(spread(docs), 48, 2L)))
    minOf("p37 crossCorpus as-is")(noop {
      val newDocs = docs.where(pmod(col("doc_id"), lit(4)) === 0)
      Dedup.crossCorpusPairs(newDocs,
        Dedup.lshIndex(docs.where(pmod(col("doc_id"), lit(4)) =!= 0), 8), 8, 800)
    })
    minOf("p37 crossCorpus spread")(noop {
      val d = spread(docs)
      val newDocs = d.where(pmod(col("doc_id"), lit(4)) === 0)
      Dedup.crossCorpusPairs(newDocs,
        Dedup.lshIndex(d.where(pmod(col("doc_id"), lit(4)) =!= 0), 8), 8, 800)
    })
    def p45Body(d: DataFrame): DataFrame = d
      .withColumn("lang_guess", TF.langGuess(TF.words(TF.normText(col("text")))))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"))
    minOf("p45 langidEval as-is")(noop(p45Body(docs)))
    minOf("p45 langidEval spread")(noop(p45Body(spread(docs))))
    def p4Body(d: DataFrame): DataFrame = {
      val dd = d.withColumn("norm", TF.normText(col("text")))
        .withColumn("ws", TF.words(col("norm")))
      TF.withSimhash16(dd, col("ws"), "simhash")
        .select(col("doc_id"), TF.fingerprint(col("norm")).as("fp"), col("simhash"),
          TF.rollingHash(col("norm")).as("rollhash"))
        .orderBy("doc_id")
    }
    minOf("p4 fingerprint as-is")(noop(p4Body(docs)))
    minOf("p4 fingerprint spread")(noop(p4Body(spread(docs))))
    minOf("p24 tfidf as-is")(noop(TF.tfidfTopK(
      docs.withColumn("_ws", TF.words(TF.normText(col("text")))), col("_ws"), 5)))
    minOf("p24 tfidf spread")(noop(TF.tfidfTopK(
      spread(docs).withColumn("_ws", TF.words(TF.normText(col("text")))), col("_ws"), 5)))

    minOf("p55 bpePairs as-is")(noop(TF.bpePairStats(docs, 40)))
    minOf("p55 bpePairs spread")(noop(TF.bpePairStats(spread(docs), 40)))
    minOf("p31 vocabCoverage as-is")(noop(TF.vocabCoverage(docs, 100)))
    minOf("p31 vocabCoverage spread")(noop(TF.vocabCoverage(spread(docs), 100)))
    minOf("p47 dsir as-is")(noop(TF.dsirScores(docs, col("lang") === "en")))
    minOf("p47 dsir spread")(noop(TF.dsirScores(spread(docs), col("lang") === "en")))
    minOf("p50 heavyHitters as-is")(noop(graft.functions.Sketches.heavyHitters(
      docs.select(explode(TF.words(TF.normText(col("text")))).as("_w")), col("_w"), 5)))
    minOf("p50 heavyHitters spread")(noop(graft.functions.Sketches.heavyHitters(
      spread(docs).select(explode(TF.words(TF.normText(col("text")))).as("_w")), col("_w"), 5)))
    minOf("p48 kmv as-is")(noop(graft.functions.Sketches.kmvDistinct(
      docs.select(col("source"), explode(TF.words(TF.normText(col("text")))).as("_w")),
      "source", col("_w"))))
    minOf("p48 kmv spread")(noop(graft.functions.Sketches.kmvDistinct(
      spread(docs).select(col("source"), explode(TF.words(TF.normText(col("text")))).as("_w")),
      "source", col("_w"))))
    // p43 tf-weighted variant (word_term_counts over the bigram array):
    // same model, occurrence counts as tf-weighted sums
    def p43Wt(d: DataFrame): DataFrame = {
      val bgArr = TF.bigrams(TF.words(TF.normText(col("text"))))
      val wt = d.select(col("doc_id"),
          explode(call_function("word_term_counts", bgArr)).as("_wt"))
        .select(col("doc_id"), col("_wt.word").as("_bg"), col("_wt.tf").as("_tf"))
      val c2 = wt.groupBy(col("_bg")).agg(sum(col("_tf")).as("_n2"))
      val c1 = c2.groupBy(substring_index(col("_bg"), " ", 1).as("_w1"))
        .agg(sum(col("_n2")).as("_n1"))
      val model = c2.join(c1, substring_index(col("_bg"), " ", 1) === col("_w1"))
        .select(col("_bg"), expr("_n2 * 1000000 div _n1").as("_ppm"))
      val perDoc = wt.join(model, "_bg")
        .groupBy(col("doc_id"))
        .agg(sum(col("_tf")).as("n_bigrams"), sum(col("_ppm") * col("_tf")).as("_s"))
      d.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(expr("_s div n_bigrams"), lit(0L)).as("score_ppm"))
    }
    minOf("p43 current")(noop(TF.bigramLmScore(docs)))
    minOf("p43 tf-weighted")(noop(p43Wt(docs)))
    minOf("p43 tf-weighted spread")(noop(p43Wt(spread(docs))))
    locally { // equality check: tf-weighted == current, row for row
      val a = TF.bigramLmScore(docs).orderBy("doc_id").collect()
      val b = p43Wt(docs).orderBy("doc_id").collect()
      println(s"[prof] p43 variant equal = ${a.sameElements(b)} (${a.length} rows)")
    }

    def p30Body(dq: DataFrame, dc: DataFrame): DataFrame = {
      val q = dq.withColumn("_st", call_function("word_stats", col("text")))
        .withColumn("word_cnt", col("_st.word_cnt"))
        .withColumn("stop_milli", TF.milli(col("_st.stop_hits"), col("word_cnt")))
        .withColumn("awc", TF.centi(col("_st.alpha_chars"), col("word_cnt")))
        .select(col("doc_id"),
          TF.qualityScore(col("word_cnt"), col("stop_milli"), col("awc")).as("quality"))
      Dedup.keepBest(q, Dedup.nearDupClusters(dc, 8, 800)).orderBy("kept_id")
    }
    minOf("p30 as-is")(noop(p30Body(docs, docs)))
    minOf("p30 quality-spread")(noop(p30Body(spread(docs), docs)))
    def p17Body(d: DataFrame): DataFrame = {
      val dd = d.withColumn("norm", TF.normText(col("text")))
        .withColumn("ws", TF.words(col("norm")))
        .withColumn("word_cnt", TF.wordCount(col("ws")))
        .withColumn("stop_milli", TF.milli(TF.setHits(col("ws"), TF.Stopwords), col("word_cnt")))
        .withColumn("awc", TF.centi(TF.alphaChars(col("norm")), col("word_cnt")))
        .withColumn("quality", TF.qualityScore(col("word_cnt"), col("stop_milli"), col("awc")))
      dd.filter(col("quality") >= 2)
        .withColumn("split", TF.splitLabel(TF.splitBucket(col("doc_id"))))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(TF.bpeTokenCount(col("text"))).as("bpe_tokens"))
        .orderBy("split", "lang")
    }
    minOf("p17ish as-is")(noop(p17Body(docs)))
    minOf("p17ish spread")(noop(p17Body(spread(docs))))
    def p14Body(d: DataFrame): DataFrame = d.select(col("doc_id"),
      TF.matchCount(col("text"), "[0-9]{3}-[0-9]{2}-[0-9]{4}").as("ent_hits"),
      TF.matchCount(col("text"), TF.EmailRe).as("email_hits"),
      md5(TF.redact(TF.redact(col("text"), "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ENT>"), TF.EmailRe, "<EMAIL>")).as("h"))
    minOf("p14ish as-is")(noop(p14Body(docs)))
    minOf("p14ish spread")(noop(p14Body(spread(docs))))

    // q36 histogram-based variant: one cells→hist chain reused by both
    // sides, norms carried THROUGH the bin join (drops the two norm-join
    // subtrees and one corpus re-aggregation)
    val events = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val HourUs = 3600L * 1000000L
    def q36Hist(ev: DataFrame): DataFrame = {
      val cells = Similarity.activityCells(ev, "user_id", "ts_us", HourUs, 24)
      val hist = Similarity.activityHistograms(cells, "user_id")
        .withColumn("_nrm", sqrt(aggregate(col("hist"), lit(0L),
          (a, x) => a + x * x).cast("double")))
      val a0 = hist.where(col("user_id") < 20)
        .select(col("user_id").as("q_id"), col("_nrm").as("_na"),
          posexplode(col("hist")).as(Seq("_h", "_ca")))
        .where(col("_ca") =!= 0)
      val b = hist
        .select(col("user_id").as("n_id"), col("_nrm").as("_nb"),
          posexplode(col("hist")).as(Seq("_h", "_cb")))
        .where(col("_cb") =!= 0)
      val dots = b.join(broadcast(a0), Seq("_h"))
        .where(col("n_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("n_id"), col("_na"), col("_nb"))
        .agg(sum(col("_ca") * col("_cb")).as("_dot"))
      val sims = dots.select(col("q_id"), col("n_id"),
        floor(lit(1e6) * col("_dot") / (col("_na") * col("_nb")))
          .cast("long").as("sim_micro"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
        .orderBy(col("sim_micro").desc, col("n_id"))
      sims.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("n_id"), col("sim_micro"))
    }
    minOf("q36 current")(noop(Similarity.activityCosineTopK(
      events, "user_id", "ts_us", HourUs, col("user_id") < 20, 3)))
    minOf("q36 hist-variant")(noop(q36Hist(events)))
    locally {
      val a = Similarity.activityCosineTopK(events, "user_id", "ts_us",
        HourUs, col("user_id") < 20, 3).orderBy("q_id", "rk").collect()
      val b = q36Hist(events).orderBy("q_id", "rk").collect()
      println(s"[prof] q36 variant equal = ${a.sameElements(b)} (${a.length} rows)")
    }

    // p56/p57/p58 tails (model pretrained outside the timed region)
    locally {
      val m2pre = IvfIndex.trainTwoLevel(embs, kTotal = 16, iters = 3, coarseK = 4)
      minOf("p56 semDedup2 only")(noop(
        Similarity.semDedup2(embs, m2pre, 450000L).orderBy("vec_id")))
      minOf("p57 knn2 only")(noop(
        IvfIndex.knn2(embs, m2pre, col("vec_id") < 20, 3, nprobe = 4,
          coarseProbe = 2).orderBy("q_id", "n_id")))
      minOf("p58 semContamination only")(noop(
        Similarity.semContamination(embs.where(col("vec_id") >= 20),
          embs.where(col("vec_id") < 20), m2pre, 350000L, nprobe = 8,
          coarseProbe = 2).orderBy("vec_id")))
    }
    def p33Body(d: DataFrame): DataFrame = {
      val sh = Dedup.shingleArrays(d).withColumn("bucket", TF.splitBucket(col("sid")))
      val train = sh.where(col("bucket") < 90)
        .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
      val test = sh.where(col("bucket") >= 95)
        .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
      Dedup.contaminationPairs(train, test, 3L).orderBy("train_id", "test_id")
    }
    minOf("p33 as-is")(noop(p33Body(docs)))
    minOf("p33 spread")(noop(p33Body(spread(docs))))

    // q37: localCheckpoint the per-user LSH index (one row per key) so
    // its 4 consumers read one materialization instead of re-deriving
    minOf("q37 current")(noop(Similarity.activityCosineTopKLsh(
      events, "user_id", "ts_us", HourUs, col("user_id") < 20, 3)
      .orderBy("q_id", "rk")))
    minOf("q37 ckpt-index")(noop {
      val (idx, blocks) = graft.functions.CheckpointUtil.trackedLocalCheckpoint(
        Similarity.activityLshIndex(events, "user_id", "ts_us", HourUs))
      val out = Similarity.activityCosineTopKLshProbe(
        idx, "user_id", col("user_id") < 20, 3).orderBy("q_id", "rk")
      out
    })
    locally {
      val a = Similarity.activityCosineTopKLsh(events, "user_id", "ts_us",
        HourUs, col("user_id") < 20, 3).orderBy("q_id", "rk").collect()
      val (idx, _) = graft.functions.CheckpointUtil.trackedLocalCheckpoint(
        Similarity.activityLshIndex(events, "user_id", "ts_us", HourUs))
      val b = Similarity.activityCosineTopKLshProbe(
        idx, "user_id", col("user_id") < 20, 3).orderBy("q_id", "rk").collect()
      println(s"[prof] q37 ckpt variant equal = ${a.sameElements(b)} (${a.length} rows)")
    }

    // p59 components
    minOf("p59 trainPq")(Pq.trainPq(embs, 8, 16, iters = 3))
    val pq = Pq.trainPq(embs, 8, 16, iters = 3)
    minOf("p56 trainTwoLevel")(IvfIndex.trainTwoLevel(embs, kTotal = 16, iters = 3, coarseK = 4))
    val m2 = IvfIndex.trainTwoLevel(embs, kTotal = 16, iters = 3, coarseK = 4)
    minOf("p12 train flat")(IvfIndex.train(embs, k = 16, iters = 3))
    minOf("p59 index2Pq")(noop(Pq.index2Pq(embs, m2, pq)))
    minOf("p59 search (index+adc)")(noop(
      Pq.knnOnPqIndex(Pq.index2Pq(embs, m2, pq), embs.where(col("vec_id") < 20),
        m2, pq, 3, nprobe = 4, coarseProbe = 2)))
    spark.stop()
  }
}
