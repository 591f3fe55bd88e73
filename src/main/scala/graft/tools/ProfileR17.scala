package graft.tools

import graft._
import graft.functions.{CheckpointUtil, Dedup, Similarity, TextFunctions => TF}
import graft.operators.{IncrementalAgg, SnapshotDiff}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 optimization profiler — same-JVM matched-window min-of-N A/Bs
  * for the VERDICT r16 "next round" list: duplicate-subtree elimination in
  * the q-family (q35 change-set fold, q36 cells, q28 digest prune), the
  * p30 quality-branch double evaluation, the p7/p22/p30 shingle-array
  * triple derivation, and the p10 prep re-scan re-measure. Every variant
  * pairs with an equality check against the current shape. */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val only: Set[String] =
      if (args.length > 2) args.drop(2).toSet else Set.empty
    def want(tag: String): Boolean = only.isEmpty || only.exists(tag.startsWith)
    def release(): Unit = Dedup.releaseCcLabels()
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // interleaved A/B: run (a, b) pairs back-to-back so both sides see the
    // same contention window; report min-of-reps for each
    def ab(tag: String)(a: => Unit)(b: => Unit): Unit = {
      if (!want(tag)) return
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); a; release(); val t1 = System.nanoTime()
        b; release(); val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val (as, bs) = (ts.map(_._1), ts.map(_._2))
      println(f"[prof] $tag%-34s A ${as.min}%.2f  B ${bs.min}%.2f  " +
        f"(A ${as.map(t => f"$t%.2f").mkString(",")} | B ${bs.map(t => f"$t%.2f").mkString(",")})")
    }
    def eq(tag: String)(a: DataFrame)(b: DataFrame): Unit = {
      if (!want(tag)) return
      val ra = a.collect(); val rb = b.collect(); release()
      println(s"[prof] $tag equal = ${ra.sameElements(rb)} (${ra.length} vs ${rb.length} rows)")
    }

    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)
    val events = Tables.events(spark, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val orders = Tables.orders(spark, dir)
    val HourUs = 3600L * 1000000L
    val DayUs = 24L * HourUs

    // ---------- q35: change-set fold ----------
    def q35Parts(adv: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      val e = events.select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val before = e.where(pmod(col("event_id"), lit(7)) =!= 0)
      val after = e.where(pmod(col("event_id"), lit(5)) =!= 0)
        .withColumn("value",
          when(pmod(col("event_id"), lit(3)) === 0, col("value") * 2)
            .otherwise(col("value")))
      val changes = SnapshotDiff.diff(before, after, Seq("event_id"))
      adv(before, changes).orderBy("user_id", "bucket_start")
    }
    val grans = Seq("hour" -> HourUs, "day" -> DayUs)
    def q35Current(before: DataFrame, changes: DataFrame): DataFrame = {
      val ladder = IncrementalAgg.rollup(before, "user_id", "ts_us", "value", grans)
      IncrementalAgg.query(IncrementalAgg.advanceChanges(
        ladder.head._2, changes, "user_id", "ts_us", "value", grans),
        "day", Long.MinValue, Long.MaxValue)
    }
    // variant: one explode pass over the change set (diff derived ONCE)
    def bucketStart(c: org.apache.spark.sql.Column, g: Long) = c - pmod(c, lit(g))
    def advanceChangesExplode(prevFinest: DataFrame, changes: DataFrame): DataFrame = {
      val contrib = changes.select(explode(array(
        struct(col("user_id").as("_k"), col("ts_us").as("_t"),
          col("value").cast("decimal(18,2)").as("_v"), lit(1L).as("_s"),
          col("_op").isin("insert", "update").as("_keep")),
        struct(col("before_user_id").as("_k"), col("before_ts_us").as("_t"),
          (-col("before_value")).cast("decimal(18,2)").as("_v"), lit(-1L).as("_s"),
          col("_op").isin("update", "delete").as("_keep")))).as("_c"))
        .where(col("_c._keep"))
        .select(col("_c._k").as("_k"), col("_c._t").as("_t"),
          col("_c._v").as("_v"), col("_c._s").as("_s"))
      val cells = contrib
        .groupBy(col("_k"), bucketStart(col("_t"), HourUs).as("bucket_start"))
        .agg(sum(col("_s")).as("cnt"), sum(col("_v")).as("sum_dec"))
        .withColumnRenamed("_k", "user_id")
      val merged = prevFinest
        .select(col("user_id"), col("bucket_start"), col("cnt"), col("sum_dec"))
        .unionByName(cells.select(col("user_id"), col("bucket_start"), col("cnt"),
          col("sum_dec").cast(prevFinest.schema("sum_dec").dataType)))
        .groupBy(col("user_id"), col("bucket_start"))
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("sum_dec")).cast("decimal(28,2)").as("sum_dec"))
        .where(col("cnt") =!= 0)
      // day level from merged hour cells (ladderFrom)
      merged.groupBy(col("user_id"), bucketStart(col("bucket_start"), DayUs).as("bucket_start"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("sum_dec")).as("sum_dec"))
        .select(col("user_id"), col("bucket_start"), col("cnt"),
          col("sum_dec").cast("double").as("total"))
    }
    def q35Explode(before: DataFrame, changes: DataFrame): DataFrame = {
      val ladder = IncrementalAgg.rollup(before, "user_id", "ts_us", "value",
        grans.take(1))
      advanceChangesExplode(ladder.head._2, changes)
    }
    ab("q35 current/explode")(noop(q35Parts(q35Current)))(noop(q35Parts(q35Explode)))
    eq("q35 current/explode")(q35Parts(q35Current))(q35Parts(q35Explode))

    // ---------- q36: checkpoint the activity cells ----------
    def q36Current(ev: DataFrame): DataFrame =
      Similarity.activityCosineTopK(ev, "user_id", "ts_us", HourUs,
        col("user_id") < 20, 3).orderBy("q_id", "rk")
    def q36Ckpt(ev: DataFrame): DataFrame = {
      val (cells, blocks) = CheckpointUtil.trackedLocalCheckpoint(
        Similarity.activityCells(ev, "user_id", "ts_us", HourUs, 24))
      CheckpointUtil.register(blocks)
      val norms = cells.groupBy(col("user_id"))
        .agg(sqrt(sum(col("_c") * col("_c")).cast("double")).as("_nrm"))
      val a0 = cells.where(col("user_id") < 20)
        .select(col("user_id").as("q_id"), col("_h"), col("_c").as("_ca"))
      val joined = cells.select(col("user_id").as("n_id"), col("_h"), col("_c").as("_cb"))
        .join(broadcast(a0), Seq("_h"))
      val dots = joined.where(col("n_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("n_id"))
        .agg(sum(col("_ca") * col("_cb")).as("_dot"))
      val na = norms.select(col("user_id").as("q_id"), col("_nrm").as("_na"))
      val nb = norms.select(col("user_id").as("n_id"), col("_nrm").as("_nb"))
      val sims = dots.join(na, "q_id").join(nb, "n_id")
        .select(col("q_id"), col("n_id"),
          floor(lit(1e6) * col("_dot") / (col("_na") * col("_nb")))
            .cast("long").as("sim_micro"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
        .orderBy(col("sim_micro").desc, col("n_id"))
      sims.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("n_id"), col("sim_micro"))
        .orderBy("q_id", "rk")
    }
    ab("q36 current/ckpt-cells")(noop(q36Current(events)))(noop(q36Ckpt(events)))
    eq("q36 current/ckpt-cells")(q36Current(events))(q36Ckpt(events))

    // ---------- q28: collect the dirty-bucket set once ----------
    def q28Sides(): (DataFrame, DataFrame) = {
      val o = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), floor(col("o_totalprice") * 100).cast("long").as("o_cents"))
      val before = o.where(pmod(col("o_orderkey"), lit(7)) =!= 0)
      val after = o.where(pmod(col("o_orderkey"), lit(5)) =!= 0)
        .withColumn("o_cents",
          when(pmod(col("o_orderkey"), lit(3)) === 0, col("o_cents") * 2)
            .otherwise(col("o_cents")))
      (before, after)
    }
    def q28Current(): DataFrame = {
      val (b, a) = q28Sides()
      SnapshotDiff.diffPruned(b, a, Seq("o_orderkey")).orderBy("o_orderkey")
    }
    def q28Collected(): DataFrame = {
      val (b, a) = q28Sides()
      val buckets = 4096
      val dirty = SnapshotDiff.dirtyBuckets(
        SnapshotDiff.bucketDigests(b, Seq("o_orderkey"), buckets),
        SnapshotDiff.bucketDigests(a, Seq("o_orderkey"), buckets))
        .collect().map(_.getLong(0)).toSeq
      def prune(df: DataFrame): DataFrame =
        df.where(pmod(xxhash64(col("o_orderkey")), lit(buckets.toLong))
          .isInCollection(dirty))
      SnapshotDiff.diff(prune(b), prune(a), Seq("o_orderkey")).orderBy("o_orderkey")
    }
    ab("q28 current/collected")(noop(q28Current()))(noop(q28Collected()))
    eq("q28 current/collected")(q28Current())(q28Collected())

    // ---------- p30: quality branch evaluated once ----------
    def p30Quality(d: DataFrame): DataFrame =
      d.withColumn("_st", call_function("word_stats", col("text")))
        .withColumn("word_cnt", col("_st.word_cnt"))
        .withColumn("stop_milli", TF.milli(col("_st.stop_hits"), col("word_cnt")))
        .withColumn("awc", TF.centi(col("_st.alpha_chars"), col("word_cnt")))
        .select(col("doc_id"),
          TF.qualityScore(col("word_cnt"), col("stop_milli"), col("awc")).as("quality"))
    def p30Current(): DataFrame =
      Dedup.keepBest(p30Quality(docs), Dedup.nearDupClusters(docs, 8, 800))
        .orderBy("kept_id")
    // (b) one pass: left-join clusters, singletons become their own cluster
    def keepBestOnePass(docsQ: DataFrame, clusters: DataFrame): DataFrame =
      docsQ.select(col("doc_id"), col("quality"))
        .join(broadcast(clusters), Seq("doc_id"), "left")
        .select(coalesce(col("canonical_id"), col("doc_id")).as("_canon"),
          coalesce(col("cluster_sz"), lit(1L)).as("_csz"),
          col("quality"), col("doc_id"))
        .groupBy(col("_canon"))
        .agg(min(struct((-col("quality")).as("qn"), col("doc_id").as("id"))).as("_k"),
          max(col("_csz")).as("cluster_sz"))
        .select(col("_k.id").as("kept_id"), (-col("_k.qn")).as("quality"),
          col("cluster_sz"))
    def p30OnePass(): DataFrame =
      keepBestOnePass(p30Quality(docs), Dedup.nearDupClusters(docs, 8, 800))
        .orderBy("kept_id")
    // (c) checkpoint the narrow quality frame, keep the keepBest shape
    def p30Ckpt(): DataFrame = {
      val (q, blocks) = CheckpointUtil.trackedLocalCheckpoint(p30Quality(docs))
      CheckpointUtil.register(blocks)
      Dedup.keepBest(q, Dedup.nearDupClusters(docs, 8, 800)).orderBy("kept_id")
    }
    ab("p30 current/onepass")(noop(p30Current()))(noop(p30OnePass()))
    ab("p30 current/ckpt-q")(noop(p30Current()))(noop(p30Ckpt()))
    eq("p30 current/onepass")(p30Current())(p30OnePass())
    eq("p30 current/ckpt-q")(p30Current())(p30Ckpt())

    // ---------- p7/p22: checkpoint the shingle arrays (3 derivations) ----------
    def minhashLshCkpt(d: DataFrame, bands: Int, thr: Int): DataFrame = {
      val (shArr, blocks) = CheckpointUtil.trackedLocalCheckpoint(
        Dedup.shingleArrays(graft.functions.Scans.spread(d)))
      CheckpointUtil.register(blocks)
      val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatureRows(shArr, bands))
      val a = shArr.select(col("sid").as("doc_a"), col("shs").as("shs_a"))
      val b = shArr.select(col("sid").as("doc_b"), col("shs").as("shs_b"))
      cands.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("shs_a"), col("shs_b"))).cast("long").as("inter"),
          size(col("shs_a")).cast("long").as("na"),
          size(col("shs_b")).cast("long").as("nb"))
        .withColumn("jacc_milli",
          floor(lit(1000.0) * col("inter") / (col("na") + col("nb") - col("inter"))).cast("long"))
        .where(col("jacc_milli") >= thr)
        .select(col("doc_a"), col("doc_b"), col("jacc_milli"))
    }
    ab("p7 current/ckpt-shArr")(noop(Dedup.minhashLsh(docs, 8, 800).orderBy("doc_a", "doc_b")))(
      noop(minhashLshCkpt(docs, 8, 800).orderBy("doc_a", "doc_b")))
    eq("p7 current/ckpt-shArr")(Dedup.minhashLsh(docs, 8, 800).orderBy("doc_a", "doc_b"))(
      minhashLshCkpt(docs, 8, 800).orderBy("doc_a", "doc_b"))

    // ---------- p10: checkpoint the prepped corpus (4 derivations) ----------
    def lshKnnCkpt(emb: DataFrame): DataFrame = {
      val (p, blocks) = CheckpointUtil.trackedLocalCheckpoint(Similarity.prep(emb))
      CheckpointUtil.register(blocks)
      val corpusSig = Similarity.signatures(p, 16, 6, 64, "vec_id")
        .toDF("n_id", "t", "bucket")
      val querySig = Similarity.signatures(p.where(col("vec_id") < 20), 16, 6, 64, "vec_id")
        .toDF("q_id", "t", "bucket")
      val cands = corpusSig.join(broadcast(querySig), Seq("t", "bucket"))
        .where(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id")).distinct()
      val corpus = p.select(col("vec_id").as("n_id"), col("vd").as("nvd"), col("nrm").as("nnrm"))
      val queries = p.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("vd").as("qvd"), col("nrm").as("qnrm"))
      val sims = cands.join(broadcast(queries), "q_id").join(corpus, "n_id")
        .select(col("q_id"), col("n_id"),
          Similarity.simMicroPre(col("qvd"), col("nvd"), col("qnrm"), col("nnrm"),
            emb.sparkSession).as("sim_micro"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("sim_micro").desc, col("n_id"))
      sims.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select(col("q_id"), col("n_id"), col("sim_micro"))
    }
    ab("p10 current/ckpt-prep")(
      noop(Similarity.lshKnn(embs, col("vec_id") < 20, 3).orderBy("q_id", "n_id")))(
      noop(lshKnnCkpt(embs).orderBy("q_id", "n_id")))
    eq("p10 current/ckpt-prep")(
      Similarity.lshKnn(embs, col("vec_id") < 20, 3).orderBy("q_id", "n_id"))(
      lshKnnCkpt(embs).orderBy("q_id", "n_id"))

    // ---------- round 2: head-to-head and checkpoint variants ----------
    ab("p30b onepass/ckpt-q")(noop(p30OnePass()))(noop(p30Ckpt()))
    def q28DirtyCkpt(): DataFrame = {
      val (b, a) = q28Sides()
      val buckets = 4096
      val (dirty, blocks) = CheckpointUtil.trackedLocalCheckpoint(
        SnapshotDiff.dirtyBuckets(
          SnapshotDiff.bucketDigests(b, Seq("o_orderkey"), buckets),
          SnapshotDiff.bucketDigests(a, Seq("o_orderkey"), buckets)))
      CheckpointUtil.register(blocks)
      def prune(df: DataFrame): DataFrame =
        df.withColumn("_bkt", pmod(xxhash64(col("o_orderkey")), lit(buckets.toLong)))
          .join(broadcast(dirty), "_bkt").drop("_bkt")
      SnapshotDiff.diff(prune(b), prune(a), Seq("o_orderkey")).orderBy("o_orderkey")
    }
    ab("q28b current/ckpt-dirty")(noop(q28Current()))(noop(q28DirtyCkpt()))
    eq("q28b current/ckpt-dirty")(q28Current())(q28DirtyCkpt())
    def q28LocalRel(): DataFrame = {
      import spark.implicits._
      val (b, a) = q28Sides()
      val buckets = 4096
      val dirtySeq = SnapshotDiff.dirtyBuckets(
        SnapshotDiff.bucketDigests(b, Seq("o_orderkey"), buckets),
        SnapshotDiff.bucketDigests(a, Seq("o_orderkey"), buckets))
        .collect().map(_.getLong(0)).toSeq
      val dirty = dirtySeq.toDF("_bkt")
      def prune(df: DataFrame): DataFrame =
        df.withColumn("_bkt", pmod(xxhash64(col("o_orderkey")), lit(buckets.toLong)))
          .join(broadcast(dirty), "_bkt").drop("_bkt")
      SnapshotDiff.diff(prune(b), prune(a), Seq("o_orderkey")).orderBy("o_orderkey")
    }
    ab("q28c current/local-rel")(noop(q28Current()))(noop(q28LocalRel()))
    eq("q28c current/local-rel")(q28Current())(q28LocalRel())

    // ---------- q31: lag-chain instead of the windowed self-join ----------
    def q31Current(): DataFrame =
      graft.operators.Patterns.timeLengthWindow(
        events.where(col("event_type") === "purchase"),
        "user_id", "ts_us", "event_id", "value", 12L * HourUs, 5)
        .withColumnRenamed("id", "event_id")
        .orderBy("user_id", "event_id")
    def q31LagChain(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val n = 5
      val spanUs = 12L * HourUs
      val ev = events.where(col("event_type") === "purchase")
      val order = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val expiredFrame = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(Window.unboundedPreceding, -spanUs)
      val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("_rn", row_number().over(order).cast("long"))
        .withColumn("_expired", count(lit(1)).over(expiredFrame))
        .withColumn("_wcnt", least(col("_rn") - col("_expired"), lit(n.toLong)))
        .withColumn("_cum", sum(col("value").cast("decimal(18,2)")).over(cum))
        .withColumn("_pcum", element_at(
          array((1 to n).map(k => lag(col("_cum"), k).over(order)): _*),
          col("_wcnt").cast("int")))
        .select(col("user_id"), col("event_id"), col("_wcnt").as("win_cnt"),
          (col("_cum") - coalesce(col("_pcum"), lit(0).cast("decimal(18,2)")))
            .cast("double").as("win_sum"))
        .orderBy("user_id", "event_id")
    }
    ab("q31 current/lag-chain")(noop(q31Current()))(noop(q31LagChain()))
    eq("q31 current/lag-chain")(q31Current())(q31LagChain())

    // ---------- keepBest at depth: old two-join vs r17 one-pass ----------
    // the one-pass shape trades the old second corpus text scan + kernel
    // for a narrow (canonical, quality, id) cell shuffle — probe both at
    // xK replicated corpora (small clustered set, the realistic regime)
    // to show the new shuffle stays linear and ahead
    def oldKeepBest(docsQ: DataFrame, clusters: DataFrame): DataFrame = {
      val clustered = clusters.join(docsQ.select(col("doc_id"), col("quality")), "doc_id")
      val keepers = clustered
        .groupBy(col("canonical_id"))
        .agg(min(struct((-col("quality")).as("qn"), col("doc_id").as("id"))).as("_k"),
          max(col("cluster_sz")).as("cluster_sz"))
        .select(col("_k.id").as("kept_id"), (-col("_k.qn")).as("quality"),
          col("cluster_sz"))
      val singles = docsQ.select(col("doc_id"), col("quality"))
        .join(clusters.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id").as("kept_id"), col("quality"), lit(1L).as("cluster_sz"))
      keepers.unionByName(singles)
    }
    for (k <- Seq(10, 40)) {
      if (want(s"keepBest x$k")) {
        val docsX = docs.select(col("doc_id"), col("text"),
            explode(sequence(lit(0), lit(k - 1))).as("_r"))
          .select((col("doc_id") * k + col("_r")).as("doc_id"), col("text"))
        val qx = p30Quality(docsX)
        // remap the small cluster set into replica-0's scaled id space
        val clusters = Dedup.nearDupClusters(docs, 8, 800)
          .select((col("doc_id") * k).as("doc_id"),
            (col("canonical_id") * k).as("canonical_id"), col("cluster_sz"))
        ab(s"keepBest x$k old/onepass")(
          noop(oldKeepBest(qx, clusters)))(
          noop(Dedup.keepBest(qx, clusters)))
        eq(s"keepBest x$k old/onepass")(
          oldKeepBest(qx, clusters).orderBy("kept_id"))(
          Dedup.keepBest(qx, clusters).orderBy("kept_id"))
      }
    }

    // ---------- p43: the perDoc join broadcasts the EXPLODED STREAM ----------
    // (Generate row-estimate trap: Catalyst sizes the blown-up bigram
    // stream as its small scan underneath and builds the join on it —
    // a full-corpus broadcast collect). Variants: broadcast the
    // vocab-sized model instead, or merge-hint the stream side.
    def p43Body(join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      val bg = docs
        .select(col("doc_id"), explode(TF.bigrams(TF.words(TF.normText(col("text"))))).as("_bg"))
      val c2 = bg.groupBy(col("_bg")).agg(count(lit(1)).as("_n2"))
      val c1 = c2.groupBy(substring_index(col("_bg"), " ", 1).as("_w1"))
        .agg(sum(col("_n2")).as("_n1"))
      val model = c2.join(c1, substring_index(col("_bg"), " ", 1) === col("_w1"))
        .select(col("_bg"), expr("_n2 * 1000000 div _n1").as("_ppm"))
      val perDoc = join(bg, model)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("_ppm")).as("_s"))
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(expr("_s div n_bigrams"), lit(0L)).as("score_ppm"))
        .orderBy("doc_id")
    }
    val p43Cur = () => p43Body((bg, model) => bg.join(model, "_bg"))
    val p43BcModel = () => p43Body((bg, model) => bg.join(broadcast(model), "_bg"))
    val p43Merge = () => p43Body((bg, model) => bg.hint("merge").join(model, "_bg"))
    ab("p43 current/bc-model")(noop(p43Cur()))(noop(p43BcModel()))
    ab("p43 current/merge")(noop(p43Cur()))(noop(p43Merge()))
    eq("p43 current/bc-model")(p43Cur())(p43BcModel())
    eq("p43 current/merge")(p43Cur())(p43Merge())

    // ---------- p6: checkpoint shArr across the SMJ self-join sides ----------
    def p6Ckpt(): DataFrame = {
      val (shArr, blocks) = CheckpointUtil.trackedLocalCheckpoint(
        Dedup.shingleArrays(docs))
      CheckpointUtil.register(blocks)
      val sh = shArr.select(col("sid"), explode(col("shs")).as("sh"))
      val a = sh.toDF("doc_a", "sh").hint("merge")
      val b = sh.toDF("doc_b", "sh").hint("merge")
      val inter = a.join(b, Seq("sh")).where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      val sizes = shArr.select(col("sid"), size(col("shs")).cast("long").as("n"))
      inter
        .join(sizes.toDF("doc_a", "na"), "doc_a")
        .join(sizes.toDF("doc_b", "nb"), "doc_b")
        .withColumn("jacc_milli",
          floor(lit(1000.0) * col("inter") / (col("na") + col("nb") - col("inter"))).cast("long"))
        .where(col("jacc_milli") >= 800)
        .select(col("doc_a"), col("doc_b"), col("jacc_milli"))
        .orderBy("doc_a", "doc_b")
    }
    ab("p6 current/ckpt-shArr")(
      noop(Dedup.ngramJaccardPairs(docs, 800).orderBy("doc_a", "doc_b")))(
      noop(p6Ckpt()))
    eq("p6 current/ckpt-shArr")(
      Dedup.ngramJaccardPairs(docs, 800).orderBy("doc_a", "doc_b"))(p6Ckpt())

    // ---------- p33: re-measure spread on the shingle source ----------
    def p33Body(d: DataFrame): DataFrame = {
      val sh = Dedup.shingleArrays(d).withColumn("bucket", TF.splitBucket(col("sid")))
      val train = sh.where(col("bucket") < 90)
        .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
      val test = sh.where(col("bucket") >= 95)
        .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
      Dedup.contaminationPairs(train, test, 3L).orderBy("train_id", "test_id")
    }
    ab("p33 asis/spread")(noop(p33Body(docs)))(
      noop(p33Body(docs.repartition(spark.sparkContext.defaultParallelism))))

    spark.stop()
  }
}
