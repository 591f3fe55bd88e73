package graft.tools

import graft.functions.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** Dev probe (r14, extended r15): the SemDeDup codebook-regime A/B.
  *
  * r14 measured the two FLAT regimes end to end: a capped codebook
  * (k = min(16·n, 512)) keeps increments flat but drifts the bulk scan
  * toward n²/k past the cap; the paper's k ∝ n flattens the scan but
  * makes every increment pay batch·k assignment dots. r15 adds the
  * TWO-LEVEL coarse quantizer ([[IvfIndex.trainTwoLevel]]): total fine
  * cells ∝ n (scan stays flat) routed through ≤64 coarse cells
  * (assignment pays 64 + k/64 ≈ 2·√k — increments stay flat too).
  *
  * Builds all three indexes (train + assign untimed — stored artifacts
  * in deployment, exactly the smoke's posture), then times (a) the
  * within-cell pair scan and (b) the fixed-batch increment probe over
  * each, reps interleaved.
  *
  * r15 adjudication (mins of 3, solo JVM, after the CodebookCodec +
  * rendering fixes): scan ×100→×400 capped 1.23→3.66 (the n²/k
  * drift), k∝n 1.17→1.47, two-level 1.11→1.36 (1.23× per 4× data);
  * probe ×100→×400 capped 0.72→0.82, k∝n 1.39→3.71 (batch·k), two-
  * level 0.69→1.03 — the two-level artifact is at-or-near best on
  * BOTH axes, resolving the r14 trade. Builds (one-time, untimed):
  * flat k=6400 96 s, two-level 170 s at ×400 — both fine under the
  * default 8g heap AFTER the rendering fix (the pre-fix hex-dumped
  * plan descriptions OOM'd 8g; same sums at 8g and 40g, determinism
  * independent of heap).
  * `runMain graft.tools.SemKnProbe <factor> [reps]` */
object SemKnProbe {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val n = if (args.nonEmpty) args(0).toInt else 100
    val reps = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embsN = ScaleSmoke.replicateEmbsRotated(
      graft.Tables.embeddings(spark, sfDir), n)
    def buildFlat(k: Int, tag: String): (String, String) = {
      val path = s"/tmp/graft_semkn_${n}_$k"
      if (!new java.io.File(s"$path/idx/_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        val model = IvfIndex.train(embsN, k = k, iters = 3,
          maxTrainVectors = math.max(1 << 16, k))
        IvfIndex.saveModel(model, s"$path/model")(spark)
        IvfIndex.index(embsN, model).write.mode("overwrite").parquet(s"$path/idx")
        println(f"[semkn] build $tag k=$k ${(System.nanoTime() - t0) / 1e9}%.1f s (untimed artifact)")
      }
      (s"$path/idx", s"$path/model")
    }
    def buildTwo(kTotal: Int): (String, String) = {
      val path = s"/tmp/graft_semkn_${n}_two$kTotal"
      if (!new java.io.File(s"$path/idx/_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        val m2 = IvfIndex.trainTwoLevel(embsN, kTotal = kTotal, iters = 3)
        IvfIndex.saveModel2(m2, s"$path/model")(spark)
        IvfIndex.index2(embsN, m2).write.mode("overwrite").parquet(s"$path/idx")
        println(f"[semkn] build two-level k=${m2.k} (coarse ${m2.coarse.k}) " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (untimed artifact)")
      }
      (s"$path/idx", s"$path/model")
    }
    val capped = buildFlat(math.min(16 * n, 512), "capped")
    val kn = buildFlat(16 * n, "k-prop-n")
    val two = buildTwo(16 * n)
    // the smoke's fixed increment batch: the base corpus re-id'd above
    // every stored id
    def batch = graft.Tables.embeddings(spark, sfDir)
      .select((col("vec_id") + lit(990000000L)).as("vec_id"),
        col("embedding"), col("label"))
    (1 to reps).foreach { r =>
      Seq(("capped", capped), ("k16n", kn), ("two", two)).foreach {
        case (tag, (idxPath, modelPath)) =>
          val t0 = System.nanoTime()
          val s = Similarity.semDedupOnIndex(spark.read.parquet(idxPath), 450000L)
            .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0)
          println(f"[semkn] scan x$n $tag rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s sum=$s")
          spark.catalog.clearCache()
          val t1 = System.nanoTime()
          val p =
            if (tag == "two") {
              val m2 = IvfIndex.loadModel2(modelPath)(spark)
              Similarity.semDedupIncrement2(spark.read.parquet(idxPath),
                  batch, m2, 450000L)
                .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0)
            } else {
              val m = IvfIndex.loadModel(modelPath)(spark)
              Similarity.semDedupIncrement(spark.read.parquet(idxPath),
                  batch, m, 450000L)
                .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0)
            }
          println(f"[semkn] probe x$n $tag rep$r ${(System.nanoTime() - t1) / 1e9}%.2f s sum=$p")
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
