package graft.tools

import graft.functions.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** Dev probe (r15): recall@k and wall time of the ANN search routes
  * against the exact answer at a replication factor — the measured
  * recall number behind [[graft.functions.IvfIndex.knn2]]'s scaladoc.
  *
  * Routes: flat IVF knn over the capped book (k = min(16n, 512),
  * nprobe cells of k), flat knn over the k∝n book, and the two-level
  * knn2 (coarseProbe coarse cells → nprobe global fine cells of 16n).
  * Ground truth: exact brute-force top-k. Recall@k = |ANN∩exact|/k
  * averaged over queries (ties at the k-th similarity make the exact
  * set slightly ambiguous; both sides break ties by ascending id, so
  * the comparison is deterministic).
  * `runMain graft.tools.KnnRecallProbe <factor> [k] [nprobe] [coarseProbe]` */
object KnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    import spark.implicits._
    val n = if (args.nonEmpty) args(0).toInt else 100
    val k = if (args.length > 1) args(1).toInt else 10
    val nprobe = if (args.length > 2) args(2).toInt else 8
    val coarseProbe = if (args.length > 3) args(3).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embsN = ScaleSmoke.replicateEmbsRotated(
      graft.Tables.embeddings(spark, sfDir), n)
    val pred = col("vec_id") < 20
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[recall] x$n $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val exact = timed("brute")(topSets(Similarity.bruteKnn(embsN, pred, k)))
    def recall(ann: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).count(ex).toDouble / ex.size
      }
      per.sum / per.size
    }
    val capped = IvfIndex.train(embsN, k = math.min(16 * n, 512), iters = 3)
    val cappedTop = timed(s"flat_capped k=${capped.k} nprobe=$nprobe")(
      topSets(IvfIndex.knn(embsN, capped, pred, k, nprobe)))
    val kn = IvfIndex.train(embsN, k = 16 * n, iters = 3,
      maxTrainVectors = math.max(1 << 16, 16 * n))
    val knTop = timed(s"flat_kn k=${kn.k} nprobe=$nprobe")(
      topSets(IvfIndex.knn(embsN, kn, pred, k, nprobe)))
    val m2 = IvfIndex.trainTwoLevel(embsN, kTotal = 16 * n, iters = 3)
    val twoTop = timed(s"two k=${m2.k} coarse=${m2.coarse.k} cp=$coarseProbe nprobe=$nprobe")(
      topSets(IvfIndex.knn2(embsN, m2, pred, k, nprobe, coarseProbe)))
    println(f"[recall] x$n k=$k nprobe=$nprobe coarseProbe=$coarseProbe " +
      f"flat_capped=${recall(cappedTop)}%.3f flat_kn=${recall(knTop)}%.3f " +
      f"two=${recall(twoTop)}%.3f")
    spark.stop()
  }
}
