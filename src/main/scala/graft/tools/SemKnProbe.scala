package graft.tools

import graft.functions.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** Dev probe (r14): quantify the codebook-cap cost the ×400 smoke
  * attributed semdedup's 4.66× growth to. The deep suite trains
  * `k = min(16·n, 512)`, so past ×32 the per-cell population grows with
  * the factor and the within-cell pair scan drifts toward n²/k; the
  * SemDeDup paper's k ∝ n regime keeps cells constant-size. This probe
  * builds BOTH indexes (train + assign untimed — they are stored
  * artifacts in deployment, exactly the smoke's posture) and times only
  * the within-cell scan over each, reps interleaved.
  * `runMain graft.tools.SemKnProbe <factor> [reps]` */
object SemKnProbe {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val n = if (args.nonEmpty) args(0).toInt else 100
    val reps = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embsN = ScaleSmoke.replicateEmbsRotated(
      graft.Tables.embeddings(spark, sfDir), n)
    def build(k: Int, tag: String): String = {
      val path = s"/tmp/graft_semkn_${n}_$k"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        val model = IvfIndex.train(embsN, k = k, iters = 3,
          maxTrainVectors = math.max(1 << 16, k))
        IvfIndex.index(embsN, model).write.mode("overwrite").parquet(path)
        println(f"[semkn] build $tag k=$k ${(System.nanoTime() - t0) / 1e9}%.1f s (untimed artifact)")
      }
      path
    }
    val capped = build(math.min(16 * n, 512), "capped")
    val kn = build(16 * n, "k-prop-n")
    (1 to reps).foreach { r =>
      Seq(("capped", capped), ("k16n", kn)).foreach { case (tag, path) =>
        val t0 = System.nanoTime()
        val s = Similarity.semDedupOnIndex(spark.read.parquet(path), 450000L)
          .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell"))).head().getLong(0)
        println(f"[semkn] scan x$n $tag rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s sum=$s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
