package graft.tools

import graft._
import graft.functions.Similarity
import org.apache.spark.sql.functions._

/** Stage attribution for the q37 activity-LSH route at deep factors:
  * which of (cells agg, hist agg, signatures+candidates, verify join)
  * dominates, and whether exchange reuse dedupes the corpus passes.
  * `runMain graft.tools.ProfileActivity <factor> [reps]` */
object ProfileActivity {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = DevTool.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hourUs = 3600000000L
    def time(tag: String)(f: => Long): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      println(f"[act] $tag%-22s x$n rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$r")
    }
    val ev = ScaleSmoke.replicateEvents(Tables.events(spark, dir), n)
    time("events_scan")(ev.count())
    val cells = Similarity.activityCells(ev, "user_id", "ts_us", hourUs)
    time("cells")(cells.count())
    val hists = Similarity.activityHistograms(cells, "user_id")
    time("hists")(hists.count())
    val p = hists
      .withColumn("_tot", aggregate(col("hist"), lit(0L), (a, x) => a + x))
      .withColumn("vd", transform(col("hist"),
        x => (x * lit(24L) - col("_tot")).cast("double")))
      .withColumn("nrm",
        sqrt(aggregate(col("hist"), lit(0L), (a, x) => a + x * x).cast("double")))
    val corpusSig = Similarity.signatures(p, 16, 6, 24, "user_id",
      Similarity.ActivityStride).toDF("n_id", "t", "bucket")
    time("corpus_sigs")(corpusSig.count())
    val querySig = Similarity.signatures(p.where(col("user_id") < 20), 16, 6, 24,
      "user_id", Similarity.ActivityStride).toDF("q_id", "t", "bucket")
    val raw = corpusSig.join(broadcast(querySig), Seq("t", "bucket"))
      .where(col("q_id") =!= col("n_id"))
    time("collisions_raw")(raw.count())
    val cands = raw.select(col("q_id"), col("n_id")).distinct()
    time("cands_distinct")(cands.count())
    time("full_lsh")(Similarity.activityCosineTopKLsh(
      ev, "user_id", "ts_us", hourUs, col("user_id") < 20, 3).count())
    time("full_exact")(Similarity.activityCosineTopK(
      ev, "user_id", "ts_us", hourUs, col("user_id") < 20, 3).count())
    spark.stop()
  }
}
