package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics of the p51 n-gram novelty score, the p52 containment
  * decontamination scan, and the p53 PMI collocations: handcrafted
  * fixtures pin the definitions, the real corpus pins the invariants
  * the DuckDB oracles rest on. */
class NoveltyContainmentSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())

  test("novelty: first introduction counts, later repeats do not") {
    val fx = Seq(
      (0L, "a b c"),   // bigrams {a b, b c}: both introduced here
      (1L, "a b x"),   // {a b (seen), b x (new)}: half novel
      (2L, "a b c"),   // {a b, b c}: nothing new
      (3L, "solo")     // < 2 words: zeros
    ).toDF("doc_id", "text")
    val r = TextFunctions.ngramNovelty(fx).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq(
      (0L, 2L, 2L, 1000L),
      (1L, 2L, 1L, 500L),
      (2L, 2L, 0L, 0L),
      (3L, 0L, 0L, 0L)))
  }

  test("novelty: corpus invariants — one row per doc, introductions sum to the corpus bigram vocabulary") {
    val r = TextFunctions.ngramNovelty(docs)
    assert(r.count() === docs.count())
    assert(r.select("doc_id").distinct().count() === docs.count())
    val vocab = docs
      .select(explode(TextFunctions.bigrams(TextFunctions.words(
        TextFunctions.normText(col("text"))))).as("bg"))
      .distinct().count()
    val introduced = r.agg(sum("novel_cnt")).as[Long].head()
    assert(introduced === vocab,
      s"every distinct corpus bigram is introduced exactly once: $introduced vs $vocab")
    // permille stays in range and is exact integer arithmetic
    assert(r.where(col("novelty_pm") < 0 || col("novelty_pm") > 1000).count() === 0)
    assert(r.where(col("novel_cnt") > col("n_bigrams")).count() === 0)
  }

  test("novelty: kernel fast path is identical to the exploded-distinct twin on the corpus") {
    // the implementation picks the word_term_counts path (extensions are
    // registered in tests); recompute through the pre-r12 exploded global
    // distinct inline and compare row-for-row
    val got = TextFunctions.ngramNovelty(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val bg = docs.select(col("doc_id").as("_id"),
        explode(TextFunctions.bigrams(TextFunctions.words(
          TextFunctions.normText(col("text"))))).as("_bg"))
      .distinct()
    val perDoc = bg.groupBy(col("_id")).agg(count(lit(1)).as("n_bigrams"))
    val novel = bg.groupBy(col("_bg")).agg(min(col("_id")).as("_first"))
      .groupBy(col("_first")).agg(count(lit(1)).as("novel_cnt"))
    val want = docs.select(col("doc_id"))
      .join(perDoc, col("doc_id") === col("_id"), "left")
      .join(novel, col("doc_id") === col("_first"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("novel_cnt"), lit(0L)).as("novel_cnt"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(coalesce(novel_cnt, 0L) * 1000) div n_bigrams"))
          .cast("long").as("novelty_pm"))
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("novelty: a persisted bigramSets projection yields row-identical results") {
    // the caller-owned single-derive path (corpus fits the storage
    // fraction): persist the exposed projection, feed it to
    // ngramNoveltyOfSets, and match the two-scan production route
    // row-for-row — plus the unpersisted composition, which is
    // correct-but-slower (the InferFiltersFromGenerate third derive;
    // see ngramNovelty's scaladoc)
    val want = TextFunctions.ngramNovelty(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val proj = TextFunctions.bigramSets(docs).persist()
    try {
      val got = TextFunctions.ngramNoveltyOfSets(proj).orderBy("doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got === want && got.nonEmpty)
    } finally proj.unpersist(false)
    val unpersisted = TextFunctions.ngramNoveltyOfSets(
        TextFunctions.bigramSets(docs)).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(unpersisted === want)
  }

  test("containment: reported best matches agree with a brute-force containment matrix") {
    val thr = 200
    val got = Dedup.containmentScan(docs, thr)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // brute force: collect shingle sets + split buckets, compute C(A,B)
    val sets = Dedup.shingleArrays(docs)
      .withColumn("bucket", TextFunctions.splitBucket(col("sid")))
      .select(col("sid"), col("bucket"), col("shs"))
      .as[(Long, Long, Seq[String])].collect()
    val train = sets.filter(_._2 < 90)
    val test = sets.filter(_._2 >= 95)
    assert(test.nonEmpty && train.nonEmpty, "fixture must populate both splits")
    val want = test.flatMap { case (tid, _, tsh) =>
      val ts = tsh.toSet
      if (ts.isEmpty) None
      else {
        val scored = train.map { case (rid, _, rsh) =>
          (rid, (ts.intersect(rsh.toSet).size.toLong * 1000L) / ts.size)
        }.filter(_._2 >= thr)
        if (scored.isEmpty) None
        else {
          val best = scored.minBy { case (rid, pm) => (-pm, rid) }
          Some((tid, best._1, best._2))
        }
      }
    }.toSeq.sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty, "fixture should produce at least one containment hit")
  }

  test("containment: threshold bounds validated; one row per test doc") {
    intercept[IllegalArgumentException] { Dedup.containmentScan(docs, -1) }
    intercept[IllegalArgumentException] { Dedup.containmentScan(docs, 1001) }
    val r = Dedup.containmentScan(docs, 0)
    assert(r.groupBy("test_id").count().where(col("count") > 1).count() === 0)
  }

  test("collocations: a bound pair outranks frequent independent words, ppm exact") {
    // "alpha beta" always adjacent; x/y frequent but co-occurring only by
    // chance. N=120 tokens, n_alpha=n_beta=10, n_ab=10:
    // pmi_ppm = 1e6·10·120/(10·10) = 12_000_000
    val fx = Seq.tabulate(10)(i =>
      (i.toLong, "alpha beta x x x x x y y y y y")).toDF("doc_id", "text")
    val r = TextFunctions.collocations(fx, 5L, 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(r.head === ("alpha beta", 10L, 12000000L))
    // ranking is strictly by (pmi desc, bigram asc)
    assert(r === r.sortBy { case (bg, _, pmi) => (-pmi, bg) })
  }

  test("bpe pairs: hand-counted overlapping pairs, single-char words excluded") {
    val fx = Seq((0L, "abab x cd")).toDF("doc_id", "text")
    val r = TextFunctions.bpePairStats(fx, 10).as[(String, Long)].collect().toSeq
    assert(r === Seq(("ab", 2L), ("ba", 1L), ("cd", 1L)))
    intercept[IllegalArgumentException] { TextFunctions.bpePairStats(fx, 0) }
  }

  test("collocations: corpus run respects minCount/k and determinism") {
    val r1 = TextFunctions.collocations(docs, 5L, 50).collect().toSeq
    val r2 = TextFunctions.collocations(docs.repartition(7), 5L, 50).collect().toSeq
    assert(r1 === r2, "ranking must not depend on partitioning")
    assert(r1.size <= 50 && r1.nonEmpty)
    assert(r1.forall(_.getLong(1) >= 5L))
    intercept[IllegalArgumentException] { TextFunctions.collocations(docs, 0L, 5) }
    intercept[IllegalArgumentException] { TextFunctions.collocations(docs, 5L, 0) }
  }
}
