package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.Dedup

/** Dedup-on-ingest LOOP: the streaming entry point that keeps a corpus
  * near-duplicate-free as crawl increments arrive, built from the same
  * kernels as the batch surface ([[Dedup.lshIndex]] /
  * [[Dedup.crossCorpusPairs]] — p37's operator pair) the way
  * [[SnapshotCapture]] wraps [[graft.operators.SnapshotDiff]]. Doc
  * frames use the corpus convention (`doc_id` long, `text` string) —
  * the column contract of every Dedup kernel underneath.
  * Each micro-batch:
  *
  *  1. INTRA-batch dedup — a doc is rejected when it near-duplicates a
  *     smaller-id doc of the same batch (deterministic keep-lowest-id
  *     rule, the same orientation as the batch pair emitters);
  *  2. CROSS-corpus probe — survivors are signed map-side and probed
  *     against the PERSISTED index; any hit is rejected. The corpus'
  *     text is never re-read — each increment pays only its own size;
  *  3. accepted docs and their index rows are appended, so batch n+1
  *     probes against everything batch n admitted.
  *
  * State layout (any Hadoop filesystem):
  * {{{
  * corpusDir/docs/b<batchId>/   accepted docs  (parquet)
  * corpusDir/index/b<batchId>/  their lshIndex rows
  * corpusDir/docs/seed/ …       optional bootstrap corpus ([[seed]])
  * }}}
  *
  * EXACTLY-ONCE admission via batch-id idempotence (the foreachBatch
  * contract): outputs land in per-batch directories written with
  * overwrite, and the cross-probe reads ONLY index directories of
  * strictly earlier batches — a replayed batch therefore cannot see the
  * index rows its failed attempt wrote (they would reject every doc
  * against itself) and recomputes the identical decision. Pinned by the
  * replay case in CorpusIngestSpec.
  *
  * Scale shape: identical to the batch operators it wraps — increment
  * signing is map-side, the probe is one (band, sig) equi-join against
  * distinct-signature rows, verify joins are candidate-sized and
  * AQE-broadcast. The index directories grow by one parquet dir per
  * batch; compact them offline (read + rewrite to `seed/`) when dir
  * count, not data size, becomes the nuisance. */
object CorpusIngest {

  /** Bootstrap the corpus with an existing deduped doc set. */
  def seed(docs: DataFrame, corpusDir: String, bands: Int): Unit = {
    docs.write.mode("overwrite").parquet(s"$corpusDir/docs/seed")
    Dedup.lshIndex(docs, bands)
      .write.mode("overwrite").parquet(s"$corpusDir/index/seed")
  }

  /** Index directories visible to `batchId`: `seed` plus `b<k>` for
    * k < batchId (NEVER the current batch — replay determinism). */
  private def priorIndexDirs(spark: SparkSession, corpusDir: String,
                             batchId: Long): Seq[String] =
    CompactDirs.readableDirs(spark, new Path(s"$corpusDir/index"))
      .filter { p =>
        p.getName == "seed" ||
          p.getName.drop(1).toLongOption.exists(_ < batchId)
      }
      .map(_.toString)

  /** The foreachBatch handler (usable directly against a batch frame —
    * the spec's replay case does exactly that). */
  def handler(corpusDir: String, bands: Int, thresholdMilli: Int)
  : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    val docs = batch.persist()
    try {
      // 1. intra-batch: reject the larger id of every near-dup pair
      val intraRejects = Dedup.minhashLsh(docs, bands, thresholdMilli)
        .select(col("doc_b").as("doc_id")).distinct()
      val intraOk = docs.join(intraRejects, Seq("doc_id"), "left_anti").persist()
      // 2. cross-corpus: probe the index of strictly earlier batches
      val prior = priorIndexDirs(spark, corpusDir, batchId)
      val accepted =
        if (prior.isEmpty) intraOk
        else {
          val crossRejects = Dedup.crossCorpusPairs(
              intraOk, spark.read.parquet(prior: _*), bands, thresholdMilli)
            .select(col("new_id").as("doc_id")).distinct()
          intraOk.join(crossRejects, Seq("doc_id"), "left_anti")
        }
      // 3. idempotent publish: per-batch dirs, overwrite-on-replay
      accepted.write.mode("overwrite").parquet(s"$corpusDir/docs/b$batchId")
      Dedup.lshIndex(accepted, bands)
        .write.mode("overwrite").parquet(s"$corpusDir/index/b$batchId")
      intraOk.unpersist()
    } finally { docs.unpersist(); () }
  }

  /** The whole accepted corpus (seed + every committed batch).
    * Only `seed` and `b<n>` directories are read — compaction temp /
    * retired dirs (`_`-prefixed) are invisible, and a crashed compact()
    * swap is healed before reading ([[CompactDirs.recover]]), so a
    * reader never double-counts and never sees a seedless window. */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = CompactDirs.readableDirs(spark, new Path(s"$corpusDir/docs"))
      .map(_.toString)
    require(dirs.nonEmpty, s"no ingested corpus under $corpusDir/docs")
    spark.read.parquet(dirs: _*)
  }

  /** Wire a streaming doc frame into the loop:
    * `CorpusIngest.start(docs, dir, ckpt, bands, 800).start()`. */
  def start(docs: DataFrame, corpusDir: String, checkpointDir: String,
            bands: Int, thresholdMilli: Int)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(handler(corpusDir, bands, thresholdMilli))

  /** Offline compaction: fold every per-batch directory into `seed/` so
    * directory count stays O(1) across long ingest histories (the
    * admission decisions are already final — compaction moves bytes,
    * never re-judges). Index rows are REUSED, not recomputed: the
    * corpus' text is not re-shingled.
    *
    * Crash contract ([[CompactDirs]]): the consolidated seed is written
    * to a `_`-prefixed temp dir (invisible to readers), swapped in, and
    * only then are the batch dirs removed. A crash before the swap
    * changes nothing; a crash ANYWHERE in the swap — including between
    * the two seed renames — is healed by [[CompactDirs.recover]]
    * (which every read path and the next compact run first: it rolls
    * the directory back to its exact pre-compact state); a crash
    * between swap and cleanup leaves batch dirs whose rows are already
    * in seed — ADMISSION stays correct (a duplicate signature row makes
    * the same reject decision) and the next compact() folds the
    * duplicates away (it dedupes on id); docs are never lost.
    *
    * Run only while no ingest query is active AND after the query's
    * last batch is committed to its checkpoint (clean stop() after
    * processAllAvailable): folding an UNCOMMITTED trailing batch into
    * seed would make its replay probe its own rows and self-reject. */
  def compact(spark: SparkSession, corpusDir: String): Unit = {
    CompactDirs.swap(spark, new Path(s"$corpusDir/docs"), Seq("doc_id"))
    CompactDirs.swap(spark, new Path(s"$corpusDir/index"), Seq("sid"))
  }
}
