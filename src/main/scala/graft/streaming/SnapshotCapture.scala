package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SnapshotDiff
import graft.sources.Jdbc

/** The capture LOOP for snapshot differencing — entry-point parity with
  * the polling and listening modes for tables the reference cannot
  * capture at all (no binlog, no monotonic offset column; see
  * [[graft.operators.SnapshotDiff]] and ref `CDCSource.java` polling
  * contract). Where polling checkpoints an offset, this loop checkpoints
  * the LAST SNAPSHOT — as parquet plus its `buckets`-row digest table —
  * under `stateDir`, so each round pays ONE source scan (write the fresh
  * snapshot) and a digest-pruned diff against the persisted state.
  *
  * State layout (any Hadoop filesystem — local, HDFS, S3A):
  * {{{
  * stateDir/round_<n>/snapshot/   parquet image of the source at round n
  * stateDir/round_<n>/digests/    SnapshotDiff.bucketDigests of it
  * stateDir/round_<n>/_COMMIT     marker, written LAST by commit()
  * }}}
  *
  * Delivery is AT-LEAST-ONCE with the same commit geometry as the
  * streaming engine's foreachBatch checkpoint (offsets commit AFTER the
  * batch handler returns): [[CaptureRound.commit]] is called after the
  * change set has been applied, so a crash between apply and commit
  * replays the round — the next capture finds the previous committed
  * state, recomputes the IDENTICAL change set (the uncommitted round's
  * files are swept on entry), and re-applies it. Round-trip and recovery
  * are pinned in CdcSpec.
  */
object SnapshotCapture {

  /** One capture round: the change set (envelope convention — feeds
    * [[JdbcApply]] unchanged) and the commit that publishes this round's
    * snapshot as the new baseline. Call `commit()` only after `changes`
    * has been fully applied/persisted downstream.
    *
    * Storage note (r17): on a non-bootstrap round `changes` comes from
    * the digest-pruned diff, whose dirty-bucket set is checkpointed and
    * registered in the session ledger — after consuming `changes` and
    * committing, call [[graft.functions.CheckpointUtil.releaseRegistered]]
    * (the self-contained entries below do) so a long-lived capture loop
    * never accumulates per-round bucket tables. */
  final case class CaptureRound(round: Long, changes: DataFrame, commit: () => Unit)

  /** Run one round against `source` (evaluated exactly once, into this
    * round's snapshot parquet — the diff then reads parquet, never the
    * live table, so mutations during the round cannot tear the image).
    * Bootstrap (no committed round yet): every row returns as an insert —
    * the initial-sync convention of the reference's snapshot-then-stream
    * modes. */
  def capture(spark: SparkSession, source: DataFrame, pk: Seq[String],
              stateDir: String, buckets: Int = 4096): CaptureRound = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = listRounds(fs, dir)
    sweepUncommitted(fs, dir, committed)
    val round = committed.lastOption.map(_ + 1L).getOrElse(0L)
    val roundDir = new Path(dir, s"round_$round")
    // ONE scan of the live source; everything downstream reads the image
    source.write.mode("overwrite").parquet(new Path(roundDir, "snapshot").toString)
    val cur = spark.read.parquet(new Path(roundDir, "snapshot").toString)
    SnapshotDiff.bucketDigests(cur, pk, buckets)
      .write.mode("overwrite").parquet(new Path(roundDir, "digests").toString)
    val changes = committed.lastOption match {
      case Some(prev) =>
        val prevDir = new Path(dir, s"round_$prev")
        SnapshotDiff.diffPrunedIncremental(
          spark.read.parquet(new Path(prevDir, "snapshot").toString),
          spark.read.parquet(new Path(prevDir, "digests").toString),
          cur, pk, buckets)
      case None => SnapshotDiff.diff(cur.limit(0), cur, pk)
    }
    CaptureRound(round, changes,
      () => { fs.create(new Path(roundDir, "_COMMIT"), true).close(); () })
  }

  /** One-call capture → apply → commit: runs [[capture]], pushes the
    * change set into `targetTable` through [[JdbcApply]]'s batched
    * prepared statements, commits the round, returns the number of
    * changes applied. The full no-binlog replication loop as a single
    * call — schedule it (cron, Airflow) and the target converges on the
    * source every round. */
  def captureAndApply(spark: SparkSession, source: DataFrame, pk: Seq[String],
                      stateDir: String, target: Jdbc.ConnectionSpec,
                      targetTable: String, buckets: Int = 4096): Long = {
    val r = capture(spark, source, pk, stateDir, buckets)
    // the change set is consumed twice (count + apply): pin it so the
    // pruned diff's join does not run twice; released before returning
    r.changes.persist()
    try {
      val n = r.changes.count()
      JdbcApply(target, targetTable, pk)(r.changes, r.round)
      r.commit()
      n
    } finally {
      r.changes.unpersist(blocking = false)
      // per-round epilogue: the change set is consumed, so the pruned
      // diff's registered dirty-bucket blocks can be freed — a scheduled
      // loop otherwise retains one bucket table per round
      graft.functions.CheckpointUtil.releaseRegistered()
    }
  }

  /** One capture round that also MAINTAINS an aggregation ladder
    * ([[graft.operators.IncrementalAgg]]) as part of the round's state:
    * bootstrap builds the finest level from the snapshot
    * (`rollup`), every later round folds the round's change set in
    * signed (`advanceChanges` — updates retract their before-image,
    * deletes only retract) and persists the new finest level under
    * `round_<n>/ladder/` BEFORE the commit marker, so the
    * crash-replay contract is unchanged: an uncommitted round is swept
    * and recomputed identically, and the committed ladder always equals
    * `rollup(snapshot_n)` (pinned in IncrementalAggSpec round by round,
    * plus a replay case). Returns the round number and the FULL ladder
    * — only the finest level persists (the coarser levels re-derive
    * cell-sized from the stored cells via `IncrementalAgg.ladder`, the
    * same read-side shape a deployment loading the parquet would use).
    *
    * 100 TB shape: round 0 pays the one full scan every capture mode
    * pays; every later round pays its change set plus a cell-sized
    * merge — the aggregation ladder rides the capture loop for free. */
  def captureIntoLadder(spark: SparkSession, source: DataFrame, pk: Seq[String],
                        stateDir: String, keyCol: String, tsCol: String,
                        valueCol: String, granularities: Seq[(String, Long)],
                        buckets: Int = 4096): (Long, Seq[(String, DataFrame)]) = {
    import graft.operators.IncrementalAgg
    val r = capture(spark, source, pk, stateDir, buckets)
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val roundDir = new Path(dir, s"round_${r.round}")
    val prevRound = new Path(dir, s"round_${r.round - 1}")
    val prevLadder = new Path(prevRound, "ladder")
    // the stored finest level is only foldable if THIS round's finest
    // grain (and column mapping) matches the one it was built under —
    // advanceChanges on a ladder of a different grain would silently
    // merge mixed-grain cells into aggregates equal to nothing. The
    // grain is persisted next to the ladder and validated every round;
    // a mismatch (or a pre-metadata ladder) re-bootstraps from the
    // snapshot instead.
    val meta = s"grain=${granularities.head._1}:${granularities.head._2};" +
      s"key=$keyCol;ts=$tsCol;value=$valueCol"
    val prevMeta = readSmallFile(fs, new Path(prevRound, "ladder_meta"))
    val finest =
      if (r.round == 0L || !fs.exists(prevLadder) || !prevMeta.contains(meta))
        IncrementalAgg.rollup(
          spark.read.parquet(new Path(roundDir, "snapshot").toString),
          keyCol, tsCol, valueCol, granularities.take(1)).head._2
      else
        IncrementalAgg.advanceChanges(spark.read.parquet(prevLadder.toString),
          r.changes, keyCol, tsCol, valueCol, granularities.take(1)).head._2
    finest.write.mode("overwrite").parquet(new Path(roundDir, "ladder").toString)
    val out = fs.create(new Path(roundDir, "ladder_meta"), true)
    try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    r.commit()
    // per-round epilogue: the change set has been folded and the ladder
    // persisted — free the pruned diff's registered dirty-bucket blocks
    graft.functions.CheckpointUtil.releaseRegistered()
    (r.round, IncrementalAgg.ladder(
      spark.read.parquet(new Path(roundDir, "ladder").toString),
      keyCol, granularities))
  }

  private def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
                            p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }

  private def listRounds(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.matches("round_\\d+"))
      .filter(p => fs.exists(new Path(p, "_COMMIT")))
      .map(_.getName.stripPrefix("round_").toLong).sorted

  /** Crash garbage: a round directory without its `_COMMIT` marker is a
    * capture that died before (or during) apply — its change set was
    * never acknowledged, so the files are dead and the round number will
    * be reused by the re-capture. */
  private def sweepUncommitted(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
                               committed: Seq[Long]): Unit =
    if (fs.exists(dir)) {
      val keep = committed.toSet
      fs.listStatus(dir).toSeq.map(_.getPath)
        .filter(_.getName.matches("round_\\d+"))
        .filterNot(p => keep.contains(p.getName.stripPrefix("round_").toLong))
        .foreach(p => fs.delete(p, true))
    }
}
