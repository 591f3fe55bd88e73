package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.{IvfIndex, Similarity}

/** Semantic dedup-on-ingest LOOP — [[CorpusIngest]] for the EMBEDDING
  * route: keeps a vector corpus near-duplicate-free (cosine ≥ τ) as
  * increments arrive, over the TWO-LEVEL quantizer artifact
  * ([[IvfIndex.trainTwoLevel]]) whose assignment cost stays flat as the
  * stored corpus grows (the r15 SemKnProbe adjudication). Vector frames
  * use the embeddings-table convention (`vec_id` long, `embedding`
  * array<float>, `label`).
  *
  * Each micro-batch is ONE [[Similarity.semDedupIncrement2]] call —
  * its keeper rule (reject a vector iff a LOWER-id vector of the same
  * fine cell, stored or in-batch, is ≥ τ) does intra-batch AND
  * cross-corpus admission in the same deterministic pass. Requires the
  * ingest contract the batch operator documents: APPEND-ONLY ids (new
  * ids exceed every stored id), the same admission orientation as the
  * text loop's keep-lowest-id rule.
  *
  * The codebook is FROZEN at [[seed]] time and every increment assigns
  * with it (the [[IvfIndex.loadModel2]] contract — re-training would
  * silently diverge the cell spaces). Re-seed to re-quantize when the
  * corpus outgrows the book — [[occupancy]] is the measured trigger
  * (re-seed near mean ≈ 4× the seed-time design occupancy); admission
  * decisions already made are final either way.
  *
  * State layout (any Hadoop filesystem):
  * {{{
  * corpusDir/model/            the Model2 codebooks (written once by seed)
  * corpusDir/vecs/seed|b<k>/   accepted vectors   (parquet)
  * corpusDir/index/seed|b<k>/  their index2 rows  (vec_id, vd, nrm, cell)
  * }}}
  *
  * EXACTLY-ONCE admission via batch-id idempotence, exactly the
  * [[CorpusIngest]] device: per-batch dirs written with overwrite, the
  * probe reads ONLY strictly-earlier index dirs, so a replayed batch
  * cannot see its failed attempt's rows and recomputes the identical
  * decision (pinned by the replay case in SemIngestSpec).
  *
  * Scale shape: the stored index is scanned once per batch and never
  * shuffled (the assigned batch broadcasts — the semDedupIncrement2
  * geometry); batch assignment pays coarseK + k/coarseK dots per
  * vector. Compact the per-batch dirs offline with [[compact]]. */
object SemIngest {

  /** Bootstrap: train the two-level book on the seed corpus (fine cells
    * sized to it via `kTotal`), persist model + vectors + index. */
  def seed(embs: DataFrame, corpusDir: String, kTotal: Int, iters: Int = 3,
           coarseK: Int = IvfIndex.DefaultCoarseK): Unit = {
    val spark = embs.sparkSession
    val m2 = IvfIndex.trainTwoLevel(embs, kTotal, iters, coarseK = coarseK)
    IvfIndex.saveModel2(m2, s"$corpusDir/model")(spark)
    embs.write.mode("overwrite").parquet(s"$corpusDir/vecs/seed")
    IvfIndex.index2(embs, m2)
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
  def handler(corpusDir: String, thresholdMicro: Long)
  : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    val m2 = IvfIndex.loadModel2(s"$corpusDir/model")(spark)
    val prior = priorIndexDirs(spark, corpusDir, batchId)
    val verdicts =
      if (prior.isEmpty) Similarity.semDedup2(batch, m2, thresholdMicro)
      else Similarity.semDedupIncrement2(
        spark.read.parquet(prior: _*), batch, m2, thresholdMicro)
    val accepted = batch.join(
      verdicts.where(col("dup_of").isNull).select("vec_id"),
      Seq("vec_id"), "left_semi")
    accepted.write.mode("overwrite").parquet(s"$corpusDir/vecs/b$batchId")
    IvfIndex.index2(accepted, m2)
      .write.mode("overwrite").parquet(s"$corpusDir/index/b$batchId")
  }

  /** The whole accepted corpus (seed + every committed batch);
    * `_`-prefixed compaction temp dirs are invisible, and a crashed
    * [[compact]] swap is healed before reading
    * ([[CompactDirs.recover]]). */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame = {
    val dirs = CompactDirs.readableDirs(spark, new Path(s"$corpusDir/vecs"))
      .map(_.toString)
    require(dirs.nonEmpty, s"no ingested corpus under $corpusDir/vecs")
    spark.read.parquet(dirs: _*)
  }

  /** Wire a streaming embedding frame into the loop:
    * `SemIngest.start(embs, dir, ckpt, 950000L).start()`. */
  def start(embs: DataFrame, corpusDir: String, checkpointDir: String,
            thresholdMicro: Long)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    embs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(handler(corpusDir, thresholdMicro))

  /** ANN search over the ingest artifact — the third workload of the
    * ONE stored index: the same model + inverted file that admit
    * increments ([[handler]]) and bound the dedup scan also answer
    * top-k similarity queries, with zero re-indexing
    * ([[IvfIndex.knn2OnIndex]]: the stored index pays one probed-cell
    * equi-join, queries broadcast). `queries` uses the embeddings
    * convention (`vec_id`, `embedding`); give queries ids disjoint
    * from the corpus (a stored vector with a query's id is excluded as
    * a self-pair). Crash-healed dirs, frozen codebook — results
    * reflect every committed batch. Output: (q_id, n_id, sim_micro).
    *
    * Recall note ([[IvfIndex.knn2]]): size `nprobe` on the order of
    * the fine sub-book size (k/coarseK) — below it, coarse routing
    * bounds recall hard. */
  def search(spark: SparkSession, corpusDir: String, queries: DataFrame,
             kNeighbors: Int, nprobe: Int, coarseProbe: Int = 2): DataFrame = {
    val m2 = IvfIndex.loadModel2(s"$corpusDir/model")(spark)
    val dirs = CompactDirs.readableDirs(spark, new Path(s"$corpusDir/index"))
      .map(_.toString)
    require(dirs.nonEmpty, s"no index under $corpusDir/index")
    IvfIndex.knn2OnIndex(spark.read.parquet(dirs: _*), queries, m2,
      kNeighbors, nprobe, coarseProbe)
  }

  /** Fine-cell occupancy of the stored index — the MEASURED re-seed
    * trigger. The two-level book is frozen at [[seed]] time with total
    * fine cells sized to the seed corpus (k ∝ n keeps the within-cell
    * pair scan linear); as ingest grows the corpus against the fixed
    * book, per-cell population rises and the increment's within-cell
    * verify work grows QUADRATICALLY in occupancy (each new vector
    * compares against every stored cell-mate). Rule of thumb: re-seed
    * (retrain + re-quantize; admissions already made stay final) once
    * `mean` exceeds ~4× the seed-time design occupancy
    * `seedVectors / Model2.k` — that is ~16× the per-cell verify work —
    * or earlier if `max` shows a runaway hot cell. All stats are
    * computed from one groupBy over the index (k-bounded result, one
    * bounded collect). */
  case class Occupancy(vectors: Long, cells: Int, populatedCells: Int,
                       mean: Double, p99: Long, max: Long)

  def occupancy(spark: SparkSession, corpusDir: String): Occupancy = {
    val m2 = IvfIndex.loadModel2(s"$corpusDir/model")(spark)
    val dirs = CompactDirs.readableDirs(spark, new Path(s"$corpusDir/index"))
      .map(_.toString)
    require(dirs.nonEmpty, s"no index under $corpusDir/index")
    val counts = spark.read.parquet(dirs: _*)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0)).sorted
    val total = counts.sum
    val k = m2.k
    Occupancy(
      vectors = total,
      cells = k,
      populatedCells = counts.length,
      mean = if (k == 0) 0.0 else total.toDouble / k,
      p99 = if (counts.isEmpty) 0L
        else counts(math.min(counts.length - 1, (counts.length * 99) / 100)),
      max = counts.lastOption.getOrElse(0L))
  }

  /** Offline compaction — the [[CorpusIngest.compact]] contract: fold
    * per-batch dirs into `seed/` (bytes move, decisions never re-judged;
    * index rows reused, vectors never re-assigned). Crash contract
    * ([[CompactDirs]]): the swap window is RECOVERABLE — a crash at any
    * point (including between the two seed renames) loses nothing,
    * because every read path and the next compact first run
    * [[CompactDirs.recover]], which rolls the directory back to its
    * exact pre-compact state; duplicate rows left across seed and
    * batch dirs (the post-swap cleanup window) make identical reject
    * decisions and fold away on the next compact. Run only with no
    * active ingest query and the last batch committed. */
  def compact(spark: SparkSession, corpusDir: String): Unit = {
    CompactDirs.swap(spark, new Path(s"$corpusDir/vecs"), Seq("vec_id"))
    CompactDirs.swap(spark, new Path(s"$corpusDir/index"), Seq("vec_id"))
  }
}
