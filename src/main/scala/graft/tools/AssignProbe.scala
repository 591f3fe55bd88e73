package graft.tools

import graft.functions.IvfIndex
import org.apache.spark.sql.functions._

/** Dev probe (r15): attribute the SemKnProbe increment gap. The ×100
  * A/B showed the two-level probe (164 dots/vector) timing EQUAL to the
  * flat k∝n probe (1600 dots/vector) — assignment flops are not the
  * cost. Both plans embed a ~6.5 MB boxed codebook literal
  * (GenericArrayData of boxed Doubles), which every TASK re-deserializes
  * from the stage's task binary. This times (a) the 2000-vector batch
  * assignment alone and (b) a literal-free baseline, per model, so the
  * gap decomposes into flops vs plan/literal overhead.
  * `runMain graft.tools.AssignProbe <factor> [reps]` */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val n = if (args.nonEmpty) args(0).toInt else 100
    val reps = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def batch = graft.Tables.embeddings(spark, sfDir)
      .select((col("vec_id") + lit(990000000L)).as("vec_id"),
        col("embedding"), col("label"))
    val capped = IvfIndex.loadModel(s"/tmp/graft_semkn_${n}_${math.min(16 * n, 512)}/model")(spark)
    val kn = IvfIndex.loadModel(s"/tmp/graft_semkn_${n}_${16 * n}/model")(spark)
    val two = IvfIndex.loadModel2(s"/tmp/graft_semkn_${n}_two${16 * n}/model")(spark)
    // per-stage accounting: executorDeserializeTime isolates task-binary
    // deserialization (where a boxed codebook literal would bill), run
    // time isolates the actual work, scheduler delay shows up as the gap
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        tasks.addAndGet(sc.stageInfo.numTasks)
        deserMs.addAndGet(sc.stageInfo.taskMetrics.executorDeserializeTime)
        runMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    def drainBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", java.lang.Long.TYPE)
        .invoke(bus, java.lang.Long.valueOf(30000L))
    }
    (1 to reps).foreach { r =>
      def t(tag: String)(f: => Long): Unit = {
        val (tk0, d0, r0) = (tasks.get, deserMs.get, runMs.get)
        val t0 = System.nanoTime()
        val s = f
        val secs = (System.nanoTime() - t0) / 1e9
        drainBus()
        println(f"[assign] x$n $tag rep$r $secs%.2f s sum=$s " +
          f"tasks=${tasks.get - tk0} deser_s=${(deserMs.get - d0) / 1e3}%.2f " +
          f"run_s=${(runMs.get - r0) / 1e3}%.2f")
      }
      t("baseline")(batch.agg(sum(col("vec_id"))).head().getLong(0))
      t("capped")(IvfIndex.index(batch, capped)
        .agg(sum(col("cell"))).head().getLong(0))
      t("k16n")(IvfIndex.index(batch, kn)
        .agg(sum(col("cell"))).head().getLong(0))
      t("two")(IvfIndex.index2(batch, two)
        .agg(sum(col("cell"))).head().getLong(0))
      // full increment with driver-phase decomposition: where do the big
      // boxed codebook literals actually cost — analysis/optimization/
      // planning (driver walks + canonicalization) or execution (per-task
      // literal deserialization)?
      def incr(tag: String, idxPath: String, f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
        t(s"incr_$tag") {
          f(spark.read.parquet(idxPath))
            .agg(sum(coalesce(col("dup_of"), lit(0L)) + col("cell")))
            .head().getLong(0)
        }
        spark.catalog.clearCache()
      }
      incr("capped", s"/tmp/graft_semkn_${n}_${math.min(16 * n, 512)}/idx",
        idx => graft.functions.Similarity.semDedupIncrement(idx, batch, capped, 450000L))
      incr("k16n", s"/tmp/graft_semkn_${n}_${16 * n}/idx",
        idx => graft.functions.Similarity.semDedupIncrement(idx, batch, kn, 450000L))
      incr("two", s"/tmp/graft_semkn_${n}_two${16 * n}/idx",
        idx => graft.functions.Similarity.semDedupIncrement2(idx, batch, two, 450000L))
    }
    spark.stop()
  }
}
