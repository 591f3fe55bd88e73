package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SemIngest.reseed]] — the operation [[SemIngest.occupancy]]'s
  * trigger calls for: retrain + re-quantize on the full corpus,
  * published model-and-index-together by one atomic generation rename.
  * Covers the functional contract (admissions final, occupancy reset,
  * post-reseed admission/search over both eras) and, via the
  * [[CompactDirs.swap]]-style failpoint, a crash after EVERY mutation
  * of the publish sequence: pre-commit crashes must leave the old
  * artifact fully live, post-commit crashes must leave the new one —
  * with no state that pairs a book with another generation's index. */
class SemReseedSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 990000L
  private val Dim = 8

  private def base(tag: Int): Array[Float] = {
    val v = Array.fill(Dim)(0.01f); v(tag % Dim) = 1.0f; v
  }
  private def near(tag: Int): Array[Float] = {
    val v = base(tag); v((tag + 1) % Dim) += 0.02f; v
  }
  private def mkEmbs(rows: (Long, Array[Float])*) =
    rows.toSeq.map { case (id, v) => (id, v.toSeq, "t") }
      .toDF("vec_id", "embedding", "label")

  /** Seed a deliberately-undersized book (kTotal=2) and grow the corpus
    * to 7 distinct directions against it — the outgrown-book state the
    * occupancy trigger detects. */
  private def grownCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("sem_reseed").toString
    val h = SemIngest.handler(dir, Tau)
    SemIngest.seed(mkEmbs(1L -> base(0), 2L -> base(1)), dir,
      kTotal = 2, coarseK = 1)
    h(mkEmbs(10L -> base(2), 11L -> base(3), 12L -> base(4)), 0L)
    h(mkEmbs(13L -> base(5), 14L -> base(6)), 1L)
    dir
  }

  private def topNames(dir: String): Set[String] =
    new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet

  test("reseed: re-quantizes without re-judging; occupancy resets; both eras stay searchable") {
    val dir = grownCorpus()
    val before = SemIngest.corpus(spark, dir)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val crowded = SemIngest.occupancy(spark, dir)
    assert(crowded.vectors === 7L && crowded.cells === 2)
    assert(crowded.mean === 3.5)

    SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2)

    // admissions are final: the accepted set is carried verbatim
    val after = SemIngest.corpus(spark, dir)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(after === before)

    // the book now fits the corpus: more cells, design-occupancy mean
    val fresh = SemIngest.occupancy(spark, dir)
    assert(fresh.vectors === 7L)
    assert(fresh.cells > crowded.cells && fresh.mean < crowded.mean)

    // one committed generation; generation-0 artifact dirs swept
    val names = topNames(dir)
    assert(names.count(_.startsWith("gen_")) === 1)
    assert(!names.contains("model") && !names.contains("index"))
    assert(names.contains("vecs")) // vectors are generation-free

    // post-reseed admission probes the re-built index: a near-copy of a
    // BATCH-era vector rejects (the gen seed covers every era), a fresh
    // direction lands — and indexes into the new generation
    val h = SemIngest.handler(dir, Tau)
    h(mkEmbs(20L -> near(2), 21L -> base(7)), 2L)
    val ids = SemIngest.corpus(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 10L, 11L, 12L, 13L, 14L, 21L))

    // search answers from seed era, batch era, and post-reseed era
    def top1(q: (Long, Array[Float])) = SemIngest.search(spark, dir,
        mkEmbs(q), kNeighbors = 1, nprobe = 8, coarseProbe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSeq
    assert(top1(900L -> near(0)) === Seq((900L, 1L)))
    assert(top1(901L -> near(2)) === Seq((901L, 10L)))
    assert(top1(902L -> near(7)) === Seq((902L, 21L)))

    // compaction of the generation's index root still works
    SemIngest.compact(spark, dir)
    assert(top1(901L -> near(2)) === Seq((901L, 10L)))
    assert(SemIngest.occupancy(spark, dir).vectors === 8L)
  }

  test("occupancy advisory: the design sidecar turns the 4x rule into a computed verdict") {
    val dir = grownCorpus() // designed 2 vecs / 2 cells = 1.0; now 7 vecs
    val crowded = SemIngest.occupancy(spark, dir)
    assert(crowded.designMean === Some(1.0))
    // mean 3.5 < 4 x 1.0: below the line
    assert(crowded.reseedAdvised === Some(false))
    // one more admitted vector: mean 8/2 = 4.0 crosses the advisory line
    SemIngest.handler(dir, Tau)(mkEmbs(15L -> base(7)), 2L)
    val over = SemIngest.occupancy(spark, dir)
    assert(over.mean === 4.0 && over.reseedAdvised === Some(true))
    // reseed resets the baseline to the NEW book's design occupancy —
    // the advisory clears and survives compaction (the sidecar lives
    // beside the model, not in the index root compact() rewrites)
    SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2)
    val fresh = SemIngest.occupancy(spark, dir)
    assert(fresh.designMean === Some(fresh.mean))
    assert(fresh.reseedAdvised === Some(false))
    SemIngest.compact(spark, dir)
    assert(SemIngest.occupancy(spark, dir) === fresh)
  }

  test("seed is bootstrap-only: refuses committed generations AND committed batch dirs") {
    val dir = grownCorpus() // has vecs/b0,b1 — re-seeding would pair the
    // new book with batch index rows coded in the OLD cell space
    val e = intercept[IllegalArgumentException] {
      SemIngest.seed(mkEmbs(1L -> base(0)), dir, kTotal = 2, coarseK = 1)
    }
    assert(e.getMessage.contains("batch dirs"))
    SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2)
    val e2 = intercept[IllegalArgumentException] {
      SemIngest.seed(mkEmbs(1L -> base(0)), dir, kTotal = 2, coarseK = 1)
    }
    assert(e2.getMessage.contains("reseed generation"))
  }

  test("generation hygiene: sequential ordinals, stray non-numeric gen_ dirs never resolve") {
    val dir = grownCorpus()
    // a stray gen_backup/ must not shadow the legacy artifact (it would
    // resolve to a dir with no model) nor rank as a generation
    assert(new java.io.File(s"$dir/gen_backup").mkdir())
    assert(SemIngest.occupancy(spark, dir).vectors === 7L) // legacy resolves
    SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2)
    // ordinals are commit-ordered (max+1), not wall-clock: first commit
    // is gen_1, the next gen_2 — a reboot cannot reorder them
    assert(topNames(dir).contains("gen_1"))
    SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2)
    val names = topNames(dir)
    assert(names.contains("gen_2") && !names.contains("gen_1"))
    // the stray dir survives sweeps untouched and still never resolves
    assert(names.contains("gen_backup"))
    assert(SemIngest.occupancy(spark, dir).vectors === 7L)
  }

  test("reseed crash before the commit rename leaves the OLD artifact fully live") {
    val dir = grownCorpus()
    val before = SemIngest.occupancy(spark, dir)
    for (point <- Seq(1, 2, 3)) { // model/index/design staged, no commit
      intercept[CompactDirs.InjectedCrash] {
        SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2,
          crashAfter = point)
      }
      // resolution still finds generation 0: same book, same index
      assert(SemIngest.occupancy(spark, dir) === before)
      // the old artifact keeps admitting and answering correctly
      val h = SemIngest.handler(dir, Tau)
      h(mkEmbs((30L + point) -> near(2)), 2L + point) // near-dup: reject
      assert(!SemIngest.corpus(spark, dir).select("vec_id").as[Long]
        .collect().contains(30L + point))
    }
    // a rerun completes and sweeps every stale staging dir
    SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2)
    val names = topNames(dir)
    assert(!names.exists(_.startsWith("_gen_")))
    assert(names.count(_.startsWith("gen_")) === 1)
  }

  test("reseed crash after the commit rename leaves the NEW artifact live; stale dirs are swept lazily") {
    val dir = grownCorpus()
    val crowded = SemIngest.occupancy(spark, dir)
    intercept[CompactDirs.InjectedCrash] {
      SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2, crashAfter = 4)
    }
    // committed: readers resolve the new generation even though the
    // generation-0 dirs still sit on disk un-swept
    val names = topNames(dir)
    assert(names.exists(_.startsWith("gen_")))
    assert(names.contains("model") && names.contains("index"))
    val fresh = SemIngest.occupancy(spark, dir)
    assert(fresh.cells > crowded.cells && fresh.mean < crowded.mean)

    // model and index stay paired mid-sweep too (crash while deleting)
    intercept[CompactDirs.InjectedCrash] {
      SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2, crashAfter = 5)
    }
    val again = SemIngest.occupancy(spark, dir)
    assert(again.vectors === 7L && again.cells > crowded.cells)

    // the next clean reseed converges the directory: one generation,
    // no gen-0 leftovers, no staging
    SemIngest.reseed(spark, dir, kTotal = 8, coarseK = 2)
    val settled = topNames(dir)
    assert(settled.count(_.startsWith("gen_")) === 1)
    assert(!settled.contains("model") && !settled.contains("index"))
    assert(!settled.exists(_.startsWith("_gen_")))

    // and the settled artifact still admits + searches correctly
    val h = SemIngest.handler(dir, Tau)
    h(mkEmbs(40L -> near(3), 41L -> base(7)), 9L)
    val ids = SemIngest.corpus(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(ids.contains(41L) && !ids.contains(40L))
  }
}
