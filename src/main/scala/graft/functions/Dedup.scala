package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH (Broder 1997, "On the
  * resemblance and containment of documents"; banding per Leskovec/
  * Rajaraman/Ullman, Mining of Massive Datasets ch. 3), SimHash buckets
  * (Charikar 2002, "Similarity estimation techniques from rounding
  * algorithms").
  *
  * Scale design (100 TB): every path is shuffle-minimal —
  *   - exact dedup: one hash aggregation on the 128-bit fingerprint (never
  *     the full text), so the shuffle carries 16 bytes + ids per row;
  *   - MinHash: ONE explode of shingles, then a single aggregation
  *     computing all band minima at once (map-side partial min), then an
  *     equi-join on (band, signature) — candidate volume is bounded by
  *     true-similar pairs plus the band false-positive rate, never O(n²);
  *   - Jaccard verify runs only on candidate pairs (semi-join pattern);
  *   - SimHash: pure map-side fingerprint + one groupBy on a 16-bit key.
  *
  * All hashes are md5-derived so a SQL oracle reproduces them exactly.
  */
object Dedup {

  /** Docs + derived `norm`, `ws`, `fp` columns (shared prep). */
  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = TextFunctions.normText(col(textCol))
    docs.withColumn("norm", norm)
      .withColumn("fp", TextFunctions.fingerprint(col("norm")))
  }

  /** Exact dedup: group by content fingerprint; canonical = min id.
    * Output: (fp, canonical_id, dup_cnt). */
  def exact(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    withFingerprint(docs)
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_cnt"))

  /** (id, shingle) exploded distinct word-trigram shingles.
    *
    * `ws` is materialized via withColumn BEFORE the trigram lambda touches
    * it: `element_at(ws, i)` inside a higher-order function re-evaluates
    * its argument expression per element, so an unmaterialized
    * regexp+split would run 3x per trigram (measured 30x slowdown). */
  def shingles(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.withColumn("_ws", TextFunctions.words(TextFunctions.normText(col(textCol))))
      .select(col(idCol).as("sid"), explode(TextFunctions.trigramShingles(col("_ws"))).as("sh"))

  /** Shingle-set sizes per doc. */
  private def shingleSizes(sh: DataFrame): DataFrame =
    sh.groupBy(col("sid")).agg(count(lit(1)).as("n"))

  /** All-pairs n-gram Jaccard over docs sharing ≥1 shingle, keeping pairs
    * with `floor(1000*|A∩B|/|A∪B|) >= thresholdMilli`.
    * Output: (doc_a, doc_b, jacc_milli), doc_a < doc_b. */
  def ngramJaccardPairs(docs: DataFrame, thresholdMilli: Int): DataFrame = {
    // localCheckpoint, not cache(): reused 3x below, but freed by the
    // ContextCleaner when unreferenced (cache() would leak across a
    // long-lived session — library operators must clean up after themselves)
    val sh = shingles(docs).localCheckpoint()
    val sizes = shingleSizes(sh)
    val a = sh.select(col("sid").as("doc_a"), col("sh"))
    val b = sh.select(col("sid").as("doc_b"), col("sh"))
    val inter = a.join(b, Seq("sh")).where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    jaccardFilter(inter, sizes, thresholdMilli)
  }

  private def jaccardFilter(inter: DataFrame, sizes: DataFrame, thresholdMilli: Int): DataFrame = {
    val sa = sizes.select(col("sid").as("doc_a"), col("n").as("na"))
    val sb = sizes.select(col("sid").as("doc_b"), col("n").as("nb"))
    inter.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jacc_milli",
        floor(lit(1000.0) * col("inter") / (col("na") + col("nb") - col("inter"))).cast("long"))
      .where(col("jacc_milli") >= thresholdMilli)
      .select(col("doc_a"), col("doc_b"), col("jacc_milli"))
  }

  /** Rows per MinHash band: a band collides when ALL `RowsPerBand`
    * min-hashes agree (collision prob j^r), which keeps random-pair false
    * candidates near zero while j≈1 near-dups still collide in some band
    * with probability 1-(1-j^r)^bands. */
  val RowsPerBand = 2

  /** MinHash signatures: for band b, sig_b = concat over r in
    * [0, RowsPerBand) of min(md5("b.r|" || shingle)). ONE aggregation
    * computes every (band, row) minimum (map-side combinable), then
    * `stack` unpivots to (sid, band, sig). */
  def minhashSignatures(sh: DataFrame, bands: Int): DataFrame = {
    val aggs = for (b <- 0 until bands; r <- 0 until RowsPerBand)
      yield min(md5(concat_ws("|", lit(s"$b.$r"), col("sh")))).as(s"mh_${b}_$r")
    val wide = sh.groupBy(col("sid")).agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 until bands).map { b =>
      val sig = (0 until RowsPerBand).map(r => s"mh_${b}_$r").mkString("concat(", ", ", ")")
      s"$b, $sig"
    }.mkString(", ")
    wide.select(col("sid"), expr(s"stack($bands, $stackArgs) as (band, sig)"))
  }

  /** LSH candidate pairs: equal signature in ≥1 band. */
  def lshCandidates(sig: DataFrame): DataFrame = {
    val a = sig.select(col("sid").as("doc_a"), col("band"), col("sig"))
    val b = sig.select(col("sid").as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** MinHash+LSH near-dup: LSH candidates verified by exact trigram
    * Jaccard ≥ thresholdMilli. Output: (doc_a, doc_b, jacc_milli).
    *
    * The verify stage joins candidates → shingles, never shingles →
    * shingles: intersection counting touches only candidate pairs'
    * shingle sets (|candidates| × shingles-per-doc rows), so verify cost
    * scales with LSH collisions, not with the corpus pair count. */
  def minhashLsh(docs: DataFrame, bands: Int, thresholdMilli: Int): DataFrame = {
    // localCheckpoint, not cache() — see ngramJaccardPairs
    val sh = shingles(docs).localCheckpoint()
    val sizes = shingleSizes(sh)
    val cands = lshCandidates(minhashSignatures(sh, bands))
    val a = sh.select(col("sid").as("doc_a"), col("sh"))
    val b = sh.select(col("sid").as("doc_b"), col("sh"))
    val inter = cands.join(a, Seq("doc_a"))      // (doc_a, doc_b, sh of a)
      .join(b, Seq("doc_b", "sh"))               // keep shingles b shares
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    jaccardFilter(inter, sizes, thresholdMilli)
  }

  /** SimHash bucket dedup: 16-bit simhash per doc, report buckets holding
    * >1 doc. Output: (simhash, dup_cnt, min_doc, max_doc). */
  def simhashBuckets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withWs = docs.withColumn("_ws",
      TextFunctions.words(TextFunctions.normText(col(textCol))))
    TextFunctions.withSimhash16(withWs, col("_ws"), "simhash")
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("dup_cnt"), min(col(idCol)).as("min_doc"), max(col(idCol)).as("max_doc"))
      .where(col("dup_cnt") > 1)
  }
}
