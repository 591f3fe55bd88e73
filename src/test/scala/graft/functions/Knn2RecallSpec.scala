package graft.functions

import graft.SparkSpec
import graft.tools.ScaleSmoke
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the mid-regime recall ORDERING the r15 knn_recall probe measured
  * (×100: two-level 0.630 > flat-k∝n 0.540 at equal probed volume;
  * ×10: 0.945 > 0.905) as a failing spec: SketchesSpec pins knn2's
  * exactness floor and full-fan-out ceiling, but without this a future
  * kernel/codec change could silently trade away the hierarchy's
  * recall advantage while both anchors stay green (r15 verdict item 3).
  *
  * Fixture is fully deterministic — rotated replicas of the sf0.001
  * embeddings (deterministic generator), deterministic training
  * (hash samples, id-ordered seeds, fixed-point accumulation),
  * deterministic tie-breaks — so the measured recalls are exact
  * constants for a given code state and the floors can sit close. */
class Knn2RecallSpec extends SparkSpec {
  import spark.implicits._

  private val Factor = 20
  private val K = 10
  private val Nprobe = 8
  private val CoarseProbe = 4

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  private def recall(exact: Map[Long, Set[Long]],
                     ann: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      ann.getOrElse(q, Set.empty).count(ex).toDouble / ex.size
    }
    per.sum / per.size
  }

  test("two-level recall@10 beats the flat k-proportional book at equal probed volume") {
    val embsN = ScaleSmoke.replicateEmbsRotated(
      graft.Tables.embeddings(spark, sf()), Factor).cache()
    try {
      val pred = col("vec_id") < 20
      val exact = topSets(Similarity.bruteKnn(embsN, pred, K))

      // both routes carry 16·n total cells and probe Nprobe of them —
      // the knn_recall probe's "equal probed volume" comparison
      val kTotal = 16 * Factor
      val flat = IvfIndex.train(embsN, k = kTotal, iters = 3,
        maxTrainVectors = math.max(1 << 16, kTotal))
      val flatRecall = recall(exact,
        topSets(IvfIndex.knn(embsN, flat, pred, K, Nprobe)))

      val m2 = IvfIndex.trainTwoLevel(embsN, kTotal = kTotal, iters = 3)
      val twoRecall = recall(exact,
        topSets(IvfIndex.knn2(embsN, m2, pred, K, Nprobe, CoarseProbe)))

      info(f"recall@$K x$Factor: two-level $twoRecall%.3f flat $flatRecall%.3f")
      assert(twoRecall >= flatRecall,
        f"two-level recall $twoRecall%.3f fell below flat $flatRecall%.3f " +
          "at equal probed volume — the hierarchy's measured advantage " +
          "(knn_recall probe, r15) regressed")
      // absolute floor just under the deterministic measured value
      // (0.935 at this fixture; flat measures 0.785), so a silent drop
      // fails even if BOTH routes degrade together
      assert(twoRecall >= 0.90,
        f"two-level recall $twoRecall%.3f below the pinned floor 0.90")
    } finally { embsN.unpersist(); () }
  }
}
