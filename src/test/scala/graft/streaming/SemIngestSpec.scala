package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The semantic dedup-on-ingest loop (the embedding-route twin of
  * CorpusIngestSpec): intra-batch keep-lowest-id, cross-corpus rejection
  * against the persisted two-level index, index growth across batches,
  * replay idempotence, and compaction. */
class SemIngestSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 990000L // cosine >= 0.99 is a duplicate
  private val Dim = 8

  /** Deterministic "direction" per tag: distinct tags are near-orthogonal
    * (distinct one-hot-ish bases), so only planted copies cross τ. */
  private def base(tag: Int): Array[Float] = {
    val v = Array.fill(Dim)(0.01f)
    v(tag % Dim) = 1.0f
    v
  }

  /** A near-identical copy (cos ≈ 0.9997 with its base). */
  private def near(tag: Int): Array[Float] = {
    val v = base(tag)
    v((tag + 1) % Dim) += 0.02f
    v
  }

  private def mkEmbs(rows: (Long, Array[Float])*) =
    rows.toSeq.map { case (id, v) => (id, v.toSeq, "t") }
      .toDF("vec_id", "embedding", "label")

  test("semantic ingest: intra-batch dedup, cross-corpus rejection, index growth, replay idempotence") {
    val dir = java.nio.file.Files.createTempDirectory("sem_ingest").toString
    val h = SemIngest.handler(dir, Tau)

    // seed: vectors 1 (tag 0), 2 (tag 1); small book, real hierarchy
    SemIngest.seed(mkEmbs(1L -> base(0), 2L -> base(1)), dir,
      kTotal = 8, coarseK = 2)

    // batch 0: 10 fresh (tag 2), 11 near-copy of seed vec 1 (cross
    // reject), 12 fresh (tag 3), 13 near-copy of 12 (intra reject —
    // larger id of the in-batch pair)
    h(mkEmbs(10L -> base(2), 11L -> near(0),
      12L -> base(3), 13L -> near(3)), 0L)
    val after0 = SemIngest.corpus(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(after0 === Set(1L, 2L, 10L, 12L))

    // batch 1: 20 near-copy of 10 — rejected ONLY if batch 0 grew the
    // index; 21 fresh (tag 4) accepted
    h(mkEmbs(20L -> near(2), 21L -> base(4)), 1L)
    val after1 = SemIngest.corpus(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(after1 === Set(1L, 2L, 10L, 12L, 21L))

    // replay of batch 0 (crash-before-checkpoint): its own index dir
    // exists and MUST be invisible to the probe, or every vector would
    // reject against itself; decisions and corpus unchanged
    h(mkEmbs(10L -> base(2), 11L -> near(0),
      12L -> base(3), 13L -> near(3)), 0L)
    val afterReplay = SemIngest.corpus(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(afterReplay === after1)
  }

  test("semantic ingest compact: same corpus, same admission decisions after") {
    val dir = java.nio.file.Files.createTempDirectory("sem_compact").toString
    val h = SemIngest.handler(dir, Tau)
    SemIngest.seed(mkEmbs(1L -> base(0)), dir, kTotal = 8, coarseK = 2)
    h(mkEmbs(10L -> base(2)), 0L)
    h(mkEmbs(11L -> base(3)), 1L)
    val before = SemIngest.corpus(spark, dir)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq

    SemIngest.compact(spark, dir)
    def subdirs(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(subdirs("vecs") === Seq("seed") && subdirs("index") === Seq("seed"))
    val after = SemIngest.corpus(spark, dir)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(after === before)

    // admission against the compacted index is unchanged: a near-dup of
    // a pre-compaction vector still rejects, a fresh one still lands
    h(mkEmbs(20L -> near(2), 21L -> base(4)), 2L)
    val ids = SemIngest.corpus(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(ids === Set(1L, 10L, 11L, 21L))
  }

  test("search: the ingest artifact answers ANN queries over every committed batch") {
    val dir = java.nio.file.Files.createTempDirectory("sem_search").toString
    val h = SemIngest.handler(dir, Tau)
    SemIngest.seed(mkEmbs(1L -> base(0), 2L -> base(1)), dir,
      kTotal = 8, coarseK = 2)
    h(mkEmbs(10L -> base(2)), 0L)
    h(mkEmbs(11L -> base(3)), 1L)

    // a query near stored vector 10 must find it first — 10 was admitted
    // by a BATCH, so the search provably covers batch dirs, not just seed
    def top(q: (Long, Array[Float])) = SemIngest.search(spark, dir,
        mkEmbs(q), kNeighbors = 1, nprobe = 8, coarseProbe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSeq
    assert(top(900L -> near(2)) === Seq((900L, 10L)))
    assert(top(901L -> near(0)) === Seq((901L, 1L))) // and the seed era

    // compaction must not change answers (bytes move, cells don't)
    SemIngest.compact(spark, dir)
    assert(top(900L -> near(2)) === Seq((900L, 10L)))
  }

  test("contamination: the ingest artifact flags stored vectors near a held-out suite") {
    val dir = java.nio.file.Files.createTempDirectory("sem_contam").toString
    val h = SemIngest.handler(dir, Tau)
    SemIngest.seed(mkEmbs(1L -> base(0), 2L -> base(1)), dir,
      kTotal = 8, coarseK = 2)
    h(mkEmbs(10L -> base(2)), 0L)
    h(mkEmbs(11L -> base(3)), 1L)

    // held-out "benchmark": one item near batch-era vector 10, one near
    // seed-era vector 1, one fresh direction — the two leaks flag with
    // the right audit columns, the fresh one flags nothing
    val suite = mkEmbs(900L -> near(2), 901L -> near(0), 902L -> base(5))
    val flagged = SemIngest.contamination(spark, dir, suite,
        thresholdMicro = Tau, nprobe = 8, coarseProbe = 2)
      .select("vec_id", "test_id").as[(Long, Long)].collect().toMap
    assert(flagged === Map(10L -> 900L, 1L -> 901L))

    // compaction moves bytes, not verdicts
    SemIngest.compact(spark, dir)
    val after = SemIngest.contamination(spark, dir, suite,
        thresholdMicro = Tau, nprobe = 8, coarseProbe = 2)
      .select("vec_id", "test_id").as[(Long, Long)].collect().toMap
    assert(after === flagged)
  }

  test("occupancy: the measured re-seed trigger counts stored vectors per fine cell") {
    val dir = java.nio.file.Files.createTempDirectory("sem_occ").toString
    val h = SemIngest.handler(dir, Tau)
    SemIngest.seed(mkEmbs(1L -> base(0), 2L -> base(1)), dir,
      kTotal = 8, coarseK = 2)
    val atSeed = SemIngest.occupancy(spark, dir)
    assert(atSeed.vectors === 2L)
    // ragged training: 2 seed vectors across coarseK=2 cells train one
    // fine centroid each, so the realized book is 2 cells (Model2.k)
    assert(atSeed.cells === 2)
    assert(atSeed.mean === 2.0 / atSeed.cells)

    // grow the corpus against the frozen book: occupancy must rise and
    // reflect batch dirs too (same readable-dirs view as the probe)
    h(mkEmbs(10L -> base(2), 11L -> base(3)), 0L)
    h(mkEmbs(12L -> base(4)), 1L)
    val grown = SemIngest.occupancy(spark, dir)
    assert(grown.vectors === 5L)
    assert(grown.cells === atSeed.cells) // the book is frozen
    assert(grown.mean > atSeed.mean && grown.max >= 1L &&
      grown.p99 <= grown.max && grown.populatedCells <= grown.cells)

    // compaction moves bytes, never assignments — occupancy unchanged
    SemIngest.compact(spark, dir)
    assert(SemIngest.occupancy(spark, dir) === grown)
  }

  test("semantic ingest through MemoryStream matches direct handler calls") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("sem_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sem_stream_ck").toString
    SemIngest.seed(mkEmbs(1L -> base(0)), dir, kTotal = 8, coarseK = 2)
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float], String)]
    val q = SemIngest.start(
      in.toDF().toDF("vec_id", "embedding", "label"), dir, ckpt, Tau).start()
    try {
      in.addData((10L, base(2).toSeq, "t"), (11L, near(0).toSeq, "t"))
      q.processAllAvailable()
      in.addData((20L, near(2).toSeq, "t"), (21L, base(4).toSeq, "t"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = SemIngest.corpus(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(ids === Set(1L, 10L, 21L))
  }
}
