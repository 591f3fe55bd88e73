package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The shared compact-and-swap routine of the two ingest loops
  * ([[CorpusIngest.compact]], [[SemIngest.compact]]): fold every
  * visible directory under `root` (`seed` plus `b<n>`) into one
  * consolidated `seed/`, with a CRASH-RECOVERABLE swap.
  *
  * The swap is two renames — `rename(seed, _old_<t>)` then
  * `rename(_compact_tmp, seed)` — which leaves a window where the seed
  * payload sits only under `_`-prefixed dirs that readers skip. The
  * window is closed by [[recover]], which every read path and the next
  * compact run first, by ROLLING BACK: throughout the window the newest
  * `_old_<t>` holds the retired seed (it is deleted only after the
  * second rename has succeeded, at which point `seed` is visible
  * again), so restoring it reproduces the exact pre-compact state —
  * batch dirs untouched, no duplicate rows, nothing lost; only the
  * compaction work is redone. Rolling FORWARD (promoting the staged
  * `_compact_tmp`) is kept as a theoretical fallback for a seedless
  * state with no `_old_` — it cannot arise from this swap's ordering,
  * and it may leave benign duplicates beside still-present batch dirs
  * (identical reject decisions; folded away by the next compact).
  *
  * When `seed` IS present, any `_` leftovers are stale: a retired seed
  * from after a completed swap, or a partial/complete staging write
  * from before one — both safe to delete. */
private[streaming] object CompactDirs {

  private val TmpName = "_compact_tmp"
  private val OldPrefix = "_old_"

  private def oldDirs(fs: FileSystem, root: Path): Seq[Path] =
    fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(OldPrefix))

  /** Directories readers may see: the consolidated `seed` plus the
    * per-batch `b<n>` dirs. `_`-prefixed staging/retired dirs and
    * anything else are invisible. */
  def visibleDirs(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName == "seed" || p.getName.matches("b\\d+"))
      .sortBy(_.getName)

  /** Finish or roll back a crashed [[swap]]. Idempotent and safe under
    * concurrent callers: renames are attempted without requiring
    * success (a racing recover may have won), then the outcome is
    * verified — `seed` must exist whenever there was a retired payload
    * to restore. No-op when `root` is absent or no crash evidence
    * exists. */
  def recover(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    val seed = new Path(root, "seed")
    val tmp = new Path(root, TmpName)
    if (!fs.exists(seed)) {
      val olds = oldDirs(fs, root)
      val hadEvidence = fs.exists(tmp) || olds.nonEmpty
      if (olds.nonEmpty) {
        // roll back: the newest retired seed is intact throughout the
        // swap window (deleted only after seed is visible again).
        val newest = olds.maxBy(
          _.getName.stripPrefix(OldPrefix).toLongOption.getOrElse(0L))
        fs.rename(newest, seed)
        ()
      } else if (fs.exists(tmp)) {
        // theoretical fallback (no _old_ survives): the staged payload
        // is a superset of the retired seed — promote it.
        fs.rename(tmp, seed)
        ()
      }
      if (hadEvidence)
        require(fs.exists(seed), s"compact recovery failed under $root: " +
          s"could not restore $seed from $TmpName/$OldPrefix* leftovers")
    }
    // seed present (possibly just restored): clear stale leftovers.
    if (fs.exists(seed)) {
      if (fs.exists(tmp)) fs.delete(tmp, true)
      oldDirs(fs, root).foreach(fs.delete(_, true))
    }
  }

  /** Thrown by the [[swap]] failpoint — test-only (CompactCrashSpec's
    * exhaustive crash-at-every-mutation cases). */
  private[streaming] final class InjectedCrash(step: Int)
    extends RuntimeException(s"injected compact crash after mutation $step")

  /** Consolidate `root`'s visible dirs into `seed/`, deduplicating on
    * `dedupCols` (a crashed previous compact is recovered first).
    * Caller contract: no active ingest query, last batch committed.
    *
    * `crashAfter` is a TEST-ONLY failpoint: throw [[InjectedCrash]]
    * after that many filesystem mutations (1 = staging written,
    * 2 = seed retired, 3 = staging promoted, 4.. = per-dir cleanup),
    * so the spec can prove recovery from a crash at EVERY point of the
    * sequence rather than only the hand-picked window. */
  def swap(spark: SparkSession, root: Path, dedupCols: Seq[String],
           crashAfter: Int = Int.MaxValue): Unit = {
    var mutations = 0
    def mutated(): Unit = {
      mutations += 1
      if (mutations >= crashAfter) throw new InjectedCrash(mutations)
    }
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    recover(fs, root)
    val dirs = visibleDirs(fs, root)
    if (dirs.size <= 1) return
    val all = spark.read.parquet(dirs.map(_.toString): _*)
      .dropDuplicates(dedupCols)
    val tmp = new Path(root, TmpName)
    all.write.mode("overwrite").parquet(tmp.toString)
    mutated()
    val seed = new Path(root, "seed")
    val old = new Path(root, s"$OldPrefix${System.nanoTime()}")
    // the recoverable window: between these two renames the seed payload
    // lives only under `_` dirs — recover() (run by every reader and the
    // next compact) rolls back to the pre-compact state, so a crash here
    // loses nothing (see object scaladoc for the ordering argument).
    if (fs.exists(seed)) {
      require(fs.rename(seed, old), s"compact: rename $seed -> $old failed")
      mutated()
    }
    require(fs.rename(tmp, seed), s"compact: rename $tmp -> $seed failed")
    mutated()
    dirs.filter(_.getName != "seed").foreach { d =>
      fs.delete(d, true); mutated()
    }
    fs.delete(old, true)
    ()
  }

  /** Recover-on-read entry: visible dirs under `root` after first
    * healing any crashed swap. */
  def readableDirs(spark: SparkSession, root: Path): Seq[Path] = {
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root)) recover(fs, root)
    visibleDirs(fs, root)
  }
}
