package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Dev diagnostic for the contam_bloom scale-smoke variance: run the
  * p33 probe repeatedly at one factor in ONE JVM, print per-run seconds
  * and which join strategy the verify join actually executed with —
  * distinguishes "AQE plan flip" from "GC/machine noise". */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse(sys.error("usage: ContamProbe <docsParquet> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = graft.GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(corpus)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val sh = Dedup.shingleArrays(docs)
      val train = sh.where(pmod(col("sid"), lit(20)) =!= 0)
        .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
      val test = sh.where(pmod(col("sid"), lit(20)) === 0)
        .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
      val df = Dedup.contaminationPairs(train, test, 3L)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val strat = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        .filter(plan.contains).mkString("+")
      println(f"[contamprobe] rep=$i sec=$sec%.2f rows=$n join=$strat")
      // variant B: same op but the verify join broadcasts the (small,
      // held-out) test side, keeping the train side map-side end-to-end
      val t1 = System.nanoTime()
      val sh2 = Dedup.shingleArrays(docs)
      val train2 = sh2.where(pmod(col("sid"), lit(20)) =!= 0)
        .select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
      val test2 = sh2.where(pmod(col("sid"), lit(20)) === 0)
        .select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
      val row = test2.agg(
        call_function("bloom_agg", col("sh"), lit(1000000L), lit(8000000L)).as("_bf")).head()
      val pruned = train2.where(
        call_function("bloom_contains", lit(row.getAs[Array[Byte]](0)), col("sh")))
      val dfB = pruned.join(broadcast(test2), Seq("sh"))
        .groupBy("train_id", "test_id").agg(count(lit(1)).as("shared"))
        .where(col("shared") >= 3L)
      val nB = dfB.count()
      val secB = (System.nanoTime() - t1) / 1e9
      println(f"[contamprobe] rep=$i variantB sec=$secB%.2f rows=$nB")
    }
    spark.stop()
  }
}
