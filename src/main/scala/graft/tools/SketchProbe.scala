package graft.tools

import org.apache.spark.sql.functions._

/** Dev diagnostic: stage-attribute ONE SketchMaintain.advance round —
  * where does the flat per-round cost go (count, cms write, kmv write,
  * candidate estimate+write, FS bookkeeping)? Mirrors IngestBench's
  * sketch_maintain fixture at factor `args(0)` (default 1).
  * `runMain graft.tools.SketchProbe [factor] [reps]` */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    sys.env.get("SPARK_GRAFT_PROBE_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    val f = if (args.nonEmpty) args(0).toInt else 1
    val reps = if (args.length > 1) args(1).toInt else 3
    val hist = spark.range(100000L * f).select(
      pmod(col("id"), lit(20)).cast("string").as("src"),
      concat(lit("w"), pmod(col("id") * 7919L, lit(50000L))).as("w"))
    val inc = spark.range(20000L).select(
      pmod(col("id"), lit(20)).cast("string").as("src"),
      concat(lit("x"), pmod(col("id") * 104729L, lit(20000L))).as("w"))
    val state = java.nio.file.Files.createTempDirectory(s"sketch_probe_$f").toString
    graft.streaming.SketchMaintain.advance(spark, hist, "src", "w", state).commit()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[sketchprobe] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"[sketchprobe] ---- advance rep $i ----")
      t("advance")(
        graft.streaming.SketchMaintain.advance(spark, inc, "src", "w", state)
          .commit())
      // stage shadows OUTSIDE the state machine (same plans, noop sink):
      val norm = inc.select(col("src").cast("string").as("_g"),
          col("w").cast("string").as("_v"))
        .where(col("_v").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("count")(norm.count())
      t("cms_noop")(graft.functions.Sketches.cmsPartial(norm, col("_v"))
        .write.format("noop").mode("overwrite").save())
      t("kmv_noop")(graft.functions.Sketches.kmvPartial(norm, "_g", col("_v"))
        .write.format("noop").mode("overwrite").save())
      val tmp = java.nio.file.Files.createTempDirectory("sketch_probe_w").toString
      t("cms_parquet")(graft.functions.Sketches.cmsPartial(norm, col("_v"))
        .write.mode("overwrite").parquet(s"$tmp/cms"))
      t("kmv_parquet")(graft.functions.Sketches.kmvPartial(norm, "_g", col("_v"))
        .write.mode("overwrite").parquet(s"$tmp/kmv"))
      val stored = spark.read.parquet(s"$tmp/cms")
      t("cand_parquet")(graft.functions.Sketches.cmsEstimate(
          norm.select(col("_v")).distinct(), "_v", stored)
        .write.mode("overwrite").parquet(s"$tmp/cand"))
      norm.unpersist(false)
    }
    spark.stop()
  }
}
