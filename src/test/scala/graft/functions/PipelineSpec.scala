package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pipeline-operator semantics: dedup paths agree, LSH recall vs brute
  * force, multimodal Dataset plumbing. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())
  private lazy val embs = Tables.embeddings(spark, sf())

  test("exact dedup: fingerprint groups partition the corpus") {
    val d = Dedup.exact(docs)
    assert(d.agg(sum("dup_cnt")).as[Long].head() === docs.count())
  }

  test("minhash LSH finds the same near-dup pairs as exhaustive jaccard") {
    val exhaustive = Dedup.ngramJaccardPairs(docs, 800)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, 8, 800)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh === exhaustive)
    assert(exhaustive.nonEmpty) // sf0.001 also plants near-dups
  }

  test("near-dup pairs are truly similar: shared trigram ratio high") {
    val pairs = Dedup.ngramJaccardPairs(docs, 800)
    pairs.select("jacc_milli").as[Long].collect()
      .foreach(j => assert(j >= 800 && j <= 1000))
  }

  test("simhash of identical text is identical; buckets well-formed") {
    val withWs = docs.limit(5)
      .withColumn("ws", TextFunctions.words(TextFunctions.normText(col("text"))))
    val fp = TextFunctions.withSimhash16(withWs, col("ws"), "s")
      .select("s").as[Long].collect()
    fp.foreach(s => assert(s >= 0 && s < (1 << 16)))
  }

  test("multi-table LSH knn: recall >= 0.4 with real candidate pruning") {
    val brute = Similarity.bruteKnn(embs, col("vec_id") < 20, 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshKnn(embs, col("vec_id") < 20, 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    // candidate volume actually pruned vs brute force
    val p = Similarity.prep(embs)
    val sig = Similarity.signatures(p, Similarity.DefaultTables, Similarity.DefaultBits, 64, "vec_id")
    val qSig = sig.where(col("vec_id") < 20).toDF("q_id", "t", "bucket")
    val nCand = sig.toDF("n_id", "t", "bucket").join(qSig, Seq("t", "bucket"))
      .where(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct().count()
    val nBrute = 20L * (embs.count() - 1)
    val pruning = nCand.toDouble / nBrute
    info(f"lsh recall=$recall%.2f candidateRate=$pruning%.2f (vs brute 1.0)")
    assert(recall >= 0.4)   // near-random vectors: sim(top3)~0.35 -> p_bit~0.61
    assert(pruning <= 0.6)  // candidates must be a strict subset
  }

  test("IVF knn: deterministic codebook, recall >= 0.4 probing 4/16 cells") {
    val m1 = IvfIndex.train(embs, k = 16, iters = 3)
    val m2 = IvfIndex.train(embs, k = 16, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq)
    val brute = Similarity.bruteKnn(embs, col("vec_id") < 20, 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.knn(embs, m1, col("vec_id") < 20, 3, nprobe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"ivf recall=$recall%.2f (probing 4 of 16 cells)")
    assert(recall >= 0.4)
    // cells partition the corpus
    val cellCnt = IvfIndex.index(embs, m1).groupBy("cell").count()
    assert(cellCnt.agg(sum("count")).as[Long].head() === embs.count())
  }

  test("balanced/stratified sampling: deterministic, partition-stable, min group kept whole") {
    import graft.Tables
    val d = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    val counts = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val mn = counts.values.min
    val kept = TextFunctions.balancedSample(d, "lang", col("doc_id"))
    val keptCounts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // the smallest group survives whole (residue < domain always)
    val minLang = counts.minBy(_._2)._1
    assert(keptCounts(minLang) === mn)
    // every group lands near the target (hash residue is uniform-ish)
    keptCounts.foreach { case (g, n) =>
      assert(n <= counts(g) && math.abs(n - mn) <= math.max(6L, mn / 2),
        s"$g kept $n of ${counts(g)}, target $mn")
    }
    // the KEPT ROW SET is identical at any partitioning (the whole point
    // of hashing ids instead of sampling by position)
    val a = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val b = TextFunctions.balancedSample(d.repartition(17), "lang", col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // caller-provided rates: rate 0 drops the group, full rate keeps it
    val rates = Seq(("en", TextFunctions.SampleResidue), ("de", 0L)).toDF("lang", "rate")
    val s = TextFunctions.stratifiedSample(d, rates, "lang", col("doc_id"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(s.get("de").isEmpty && s("en") === counts("en") && s.size === 1)
  }

  test("sampling: caller columns named rate/_cnt/_mn survive untouched") {
    import graft.Tables
    // a corpus that already carries the working-column names — the join
    // must neither throw ambiguous-reference nor drop the user's columns
    val d = Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"),
        col("doc_id").cast("int").as("rate"),
        lit(7).as("_cnt"), lit(8).as("_mn"))
    val rates = Seq(("en", TextFunctions.SampleResidue)).toDF("lang", "rate")
    val s = TextFunctions.stratifiedSample(d, rates, "lang", col("doc_id"))
    assert(s.columns.sorted.toSeq === d.columns.sorted.toSeq)
    // user's own rate column intact (= doc_id), not overwritten by the table's
    assert(s.where(col("rate") =!= col("doc_id").cast("int")).count() === 0)
    val b = TextFunctions.balancedSample(d, "lang", col("doc_id"))
    assert(b.columns.sorted.toSeq === d.columns.sorted.toSeq)
    assert(b.where(col("_cnt") =!= 7 || col("_mn") =!= 8).count() === 0)
    // and the kept row set matches the clean-schema run
    val clean = TextFunctions.balancedSample(
      d.select("doc_id", "lang"), "lang", col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(b.select("doc_id").as[Long].collect().sorted.toSeq === clean)
  }

  test("IVF train-on-sample: cap engages deterministically; below the cap nothing changes") {
    def eq(a: IvfIndex.Model, b: IvfIndex.Model): Boolean =
      a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq
    val full = IvfIndex.train(embs, k = 8, iters = 2)
    // cap above the corpus: the sample IS the corpus — codebook identical
    assert(eq(IvfIndex.train(embs, k = 8, iters = 2, maxTrainVectors = 1000000), full))
    // cap below the corpus: deterministic across runs, and actually engaged
    val c1 = IvfIndex.train(embs, k = 8, iters = 2, maxTrainVectors = 200)
    val c2 = IvfIndex.train(embs, k = 8, iters = 2, maxTrainVectors = 200)
    assert(eq(c1, c2))
    assert(!eq(c1, full))
    // a capped codebook still assigns and searches the FULL corpus
    assert(IvfIndex.index(embs, c1).agg(sum(lit(1))).as[Long].head() === embs.count())
    val knn = IvfIndex.knn(embs, c1, col("vec_id") < 20, 3, nprobe = 4)
    assert(knn.groupBy("q_id").count().as[(Long, Long)].collect().forall(_._2 === 3L))
  }

  test("vec_sum_fixed aggregate matches per-dimension column sums") {
    assert(spark.catalog.functionExists("vec_sum_fixed"))
    val embs = Similarity.prep(graft.Tables.embeddings(spark, sf()))
      .select(col("label"), col("vd"))
    val scale = 1L << 40
    val native = embs.groupBy("label")
      .agg(call_function("vec_sum_fixed", col("vd"), lit(scale)).as("s"),
        count(lit(1)).as("n"))
      .as[(Int, Seq[Long], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val dim = embs.select(size(col("vd"))).as[Int].head()
    val aggCols = (0 until dim).map(i =>
      sum((element_at(col("vd"), i + 1) * scale).cast("long")).as(s"s$i")) :+
      count(lit(1)).as("n")
    val composable = embs.groupBy("label").agg(aggCols.head, aggCols.tail: _*)
      .collect().map { r =>
        r.getAs[Int]("label") ->
          (((0 until dim).map(i => r.getAs[Long](s"s$i")), r.getAs[Long]("n")))
      }.toMap
    assert(native.nonEmpty && native.keySet === composable.keySet)
    native.foreach { case (k, (s, n)) =>
      assert(s === composable(k)._1 && n === composable(k)._2, s"label $k")
    }
  }

  test("cosine of a vector with itself is 1.0 (sim_micro == 999999 or 1000000)") {
    val self = Similarity.prep(embs.limit(10))
      .select(floor(lit(1e6) * Similarity.dot(col("vd"), col("vd")) /
        (col("nrm") * col("nrm"))).cast("long").as("s"))
      .as[Long].collect()
    self.foreach(s => assert(s === 999999L || s === 1000000L))
  }

  test("multimodal: Dataset[MediaFile] decode plumbing (mapPartitions batch)") {
    val media = Multimodal.documentsAsMedia(docs.limit(20))
      .as[Multimodal.MediaFile]
    val meta = Multimodal.decodeMeta(media)
    val rows = meta.collect()
    assert(rows.length === 20)
    rows.foreach { m =>
      assert(m.byte_len > 0)
      assert(m.width === 64 + (m.byte_len % 512).toInt)
      assert(m.content_md5.length === 32)
    }
    // columnar twin agrees with the Dataset path
    val colTwin = Multimodal.mediaMetaColumns(docs.limit(20))
      .select("media_id", "content_md5").as[(Long, String)].collect().toMap
    rows.foreach(m => assert(colTwin(m.media_id) === m.content_md5))
  }

  test("multimodal: frame sampling strides the payload") {
    val media = Multimodal.documentsAsMedia(docs.limit(3)).as[Multimodal.MediaFile]
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val byDoc = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc.size === 3)
    byDoc.values.foreach(n => assert(n >= 1))
    frames.select("frame_no").as[Int].collect().foreach(f => assert(f % 4 === 0))
  }

  test("word_rep_stats native p15 matches the composable explode+agg twin") {
    assert(spark.catalog.functionExists("word_rep_stats"))
    val native = graft.SparkEntry.queries("p15_repetition")(spark, sf())
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val composable = graft.PipelineQueries.p15Composable(spark, sf())
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(native.nonEmpty && native === composable)
  }

  test("word_stats native p1/p2/p3 match the composable twins") {
    assert(spark.catalog.functionExists("word_stats"))
    val p1n = graft.SparkEntry.queries("p1_text_stats")(spark, sf())
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val p1c = graft.PipelineQueries.p1Composable(spark, sf())
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(p1n.nonEmpty && p1n === p1c)
    val p2n = graft.SparkEntry.queries("p2_quality_score")(spark, sf())
      .as[(Long, Long, Long, Int)].collect().toSeq
    val p2c = graft.PipelineQueries.p2Composable(spark, sf())
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(p2n.nonEmpty && p2n === p2c)
    val p3n = graft.SparkEntry.queries("p3_langid")(spark, sf())
      .as[(Long, String)].collect().toSeq
    val p3c = graft.PipelineQueries.p3Composable(spark, sf())
      .as[(Long, String)].collect().toSeq
    assert(p3n.nonEmpty && p3n === p3c)
  }

  test("word_stats ws_tokens keeps trailing empty tokens like split (advice regression)") {
    // split(trim(text), "\\s+") uses Java split with limit -1, which keeps
    // BOTH leading and trailing empty tokens; trim strips only 0x20
    val texts = Seq("hello\n", "\t", "hello \nworld\t", "a \n", " \r\n ", "x", "", "  ")
    val df = texts.toDF("text")
    val native = df.selectExpr("word_stats(text) AS s")
      .select("s.ws_tokens").as[Long].collect().toSeq
    val composable = df.select(TextFunctions.wsTokenCount(col("text")))
      .as[Long].collect().toSeq
    assert(native === composable)
    assert(native.take(3) === Seq(2L, 2L, 3L)) // the advice's exact counterexamples
  }

  test("char_hist16 native p21 matches the composable explode+agg twin; Generate bounded") {
    assert(spark.catalog.functionExists("char_hist16"))
    val q = graft.SparkEntry.queries("p21_byte_histogram")(spark, sf())
    val native = q.as[(Long, Int, Long)].collect().toSeq
    val composable = graft.PipelineQueries.p21Composable(spark, sf())
      .as[(Long, Int, Long)].collect().toSeq
    assert(native.nonEmpty && native === composable)
    // the Generate explodes the 16-element per-row histogram, not the text
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("char_hist16"), plan)
    // null/empty text edge: no rows, like split(null)/[''] in the twin
    val edge = Seq((1L, null), (2L, ""), (3L, "aA"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(call_function("char_hist16", col("text"))).as(Seq("bin", "cnt")))
      .where(col("cnt") > 0)
      .as[(Long, Int, Long)].collect().toSeq
    assert(edge === Seq((3L, 1, 2L))) // 'a'=97, 'A'=65 -> both bin 1, one histogram row
  }

  test("word_rep_stats edge cases: null, empty, single word, all-same, bigram repeats") {
    // null text propagates a NULL struct; the p15 caller coalesces each
    // count to 0, matching the composable twin's left-join + COALESCE
    // and the DuckDB oracle (code-review regression)
    val rows = Seq(null, "", "solo", "a a a a", "x y x y x", "Tik-tok? tik TOK!")
      .toDF("text")
      .selectExpr("word_rep_stats(text) AS s")
      .select(coalesce(col("s.total"), lit(0L)), coalesce(col("s.dst"), lit(0L)),
        coalesce(col("s.top"), lit(0L)), coalesce(col("s.btotal"), lit(0L)),
        coalesce(col("s.btop"), lit(0L)))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (0L, 0L, 0L, 0L, 0L),      // null text -> all-zero stats after coalesce
      (0L, 0L, 0L, 0L, 0L),      // no words
      (1L, 1L, 1L, 0L, 0L),      // one word, no bigrams
      (4L, 1L, 4L, 3L, 3L),      // "a a" x3
      (5L, 2L, 3L, 4L, 2L),      // bigrams x·y ×2, y·x ×2 -> btop 2
      (4L, 2L, 2L, 3L, 2L)))     // case-folded: tik tok tik tok
  }

  test("codegen simhash16 is bit-identical to the composable md5-fold form") {
    import org.apache.spark.sql.functions.{aggregate => fold, _}
    val withWs = docs
      .withColumn("ws", TextFunctions.words(TextFunctions.normText(col("text"))))
    val native = TextFunctions.withSimhash16(withWs, col("ws"), "s")
      .select("doc_id", "s").as[(Long, Long)].collect().toMap
    // composable reference form, built inline (bypasses the native branch)
    val sums = array((1 to 16).map { j =>
      fold(col("_m"), lit(0L),
        (acc, m) => acc + when(substring(m, j, 1) >= "8", 1L).otherwise(-1L))
    }: _*)
    val fp = (1 to 16).map { j =>
      when(element_at(col("_s"), j) > 0, lit(1L << (j - 1))).otherwise(lit(0L))
    }.reduce(_ + _).cast("long")
    val composable = withWs.withColumn("_m", transform(col("ws"), w => md5(w)))
      .withColumn("_s", sums).withColumn("s", fp)
      .select("doc_id", "s").as[(Long, Long)].collect().toMap
    assert(native === composable)
  }

  test("vec_dot native and fallback agree on length-mismatched and null vectors") {
    import org.apache.spark.sql.functions.{aggregate => fold, _}
    // fallback form as built by Similarity.dot when vec_dot is absent
    def fb(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val n = least(size(a), size(b))
      fold(zip_with(slice(a, lit(1), n), slice(b, lit(1), n), _ * _),
        lit(0.0), (acc, x) => acc + x)
    }
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)),          // mismatched: truncate to min
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),               // matched
      (Seq.empty[Double], Seq(1.0)),                // empty
    ).toDF("a", "b")
    val both = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      fb(col("a"), col("b")).as("fallback")).as[(Double, Double)].collect()
    assert(both.forall { case (n, f) => n === f })
    assert(both(0)._1 === 14.0) // 1*4 + 2*5, third element ignored
    // null input → null on both paths
    val nulls = df.limit(1)
      .select(call_function("vec_dot", lit(null).cast("array<double>"), col("b")).as("n"),
        fb(lit(null).cast("array<double>"), col("b")).as("f"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("simhash16 native and fallback both yield NULL for null word array") {
    import org.apache.spark.sql.functions.{aggregate => fold, _}
    val df = Seq((1L, Some("the quick fox")), (2L, None))
      .toDF("doc_id", "text")
      .withColumn("ws", when(col("text").isNotNull,
        TextFunctions.words(TextFunctions.normText(col("text")))))
    val native = TextFunctions.withSimhash16(df, col("ws"), "s")
      .select("doc_id", "s").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // fallback form, built inline (bypasses the native branch)
    val sums = array((1 to 16).map { j =>
      fold(col("_m"), lit(0L),
        (acc, m) => acc + when(substring(m, j, 1) >= "8", 1L).otherwise(-1L))
    }: _*)
    val fp = (1 to 16).map { j =>
      when(element_at(col("_s"), j) > 0, lit(1L << (j - 1))).otherwise(lit(0L))
    }.reduce(_ + _).cast("long")
    val fallback = df.withColumn("_m", transform(col("ws"), w => md5(w)))
      .withColumn("_s", sums)
      .withColumn("s", when(col("_m").isNull, lit(null).cast("long")).otherwise(fp))
      .select("doc_id", "s").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(native === fallback)
    assert(native(2L) === None)   // null text → NULL fingerprint, not 0
    assert(native(1L).nonEmpty)
  }

  test("langGuess is deterministic and falls back to und") {
    val out = Seq("le le le les et", "xyz qrs", "the a of", "")
      .toDF("text")
      .select(TextFunctions.langGuess(
        TextFunctions.words(TextFunctions.normText(col("text")))).as("g"))
      .as[String].collect()
    assert(out.toSeq === Seq("fr", "und", "en", "und"))
  }

  test("token counts: ws vs bpe-ish on punctuation-bearing text") {
    val out = Seq("Hello, world! 42 times.").toDF("text")
      .select(TextFunctions.wsTokenCount(col("text")).as("ws"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe"))
      .as[(Long, Long)].head()
    assert(out._1 === 4) // whitespace tokens
    assert(out._2 === 7) // hello , world ! 42 times . => letters/digits/punct runs
  }

  test("multimodal feature extraction + resize: histogram counts bytes; resize shrinks payload") {
    import Multimodal._
    val files = Seq(
      MediaFile(1L, "text", "aaaa".getBytes("UTF-8")), // 'a' = 97 -> bin 1
      MediaFile(2L, "text", Array[Byte](0, 16, 32, 15))) // bins 0,0,0,15
      .toDS()
    val hist = byteHistogram(files).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hist(1L)(1) === 4L && hist(1L).sum === 4L)
    assert(hist(2L)(0) === 3L && hist(2L)(15) === 1L && hist(2L).sum === 4L)
    // resize: payload shrinks proportionally, never grows, id/kind kept
    val big = MediaFile(3L, "img", Array.fill[Byte](1000)(7))
    val out = resizeStub(Seq(big).toDS(), targetWidth = 32).collect().head
    assert(out.media_id === 3L && out.kind === "img")
    assert(out.content.length < 1000 && out.content.length >= 1)
    // already-small payloads pass through unchanged (scale capped at 1.0)
    val small = MediaFile(4L, "img", Array.fill[Byte](3)(1))
    val (w, _, _) = FakeCodec.decode(small.content)
    val kept = resizeStub(Seq(small).toDS(), targetWidth = w + 100).collect().head
    assert(kept.content.length === 3)
  }

  test("SQL-registered expressions reject bad arity / non-literal args as analysis errors") {
    import org.apache.spark.sql.AnalysisException
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT minhash_bands(array('a'))").collect()
    }
    assert(e1.getMessage.contains("minhash_bands"))
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT minhash_bands(array('a'), x, 2) FROM (SELECT 1 AS x)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("foldable") ||
      e2.getMessage.contains("minhash_bands"))
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    assert(e3.getMessage.contains("vec_dot"))
    val e4 = intercept[AnalysisException] {
      spark.sql("SELECT bloom_agg('x')").collect()
    }
    assert(e4.getMessage.contains("bloom_agg"))
    val e5 = intercept[AnalysisException] {
      spark.sql("SELECT bloom_agg(sh, n, 100) FROM (SELECT 'a' AS sh, 5 AS n)").collect()
    }
    assert(e5.getMessage.toLowerCase.contains("foldable") ||
      e5.getMessage.contains("bloom_agg"))
    val e6 = intercept[AnalysisException] {
      spark.sql("SELECT bloom_contains(CAST('ab' AS BINARY))").collect()
    }
    assert(e6.getMessage.contains("bloom_contains"))
  }

  test("redaction: email/phone masks + match counts (PII scrub)") {
    val out = Seq("mail bob.smith+x@corp.example.com or +1 555-123 4567 now")
      .toDF("text")
      .select(
        TextFunctions.matchCount(col("text"), TextFunctions.EmailRe).as("e"),
        TextFunctions.matchCount(col("text"), TextFunctions.PhoneRe).as("p"),
        TextFunctions.redact(
          TextFunctions.redact(col("text"), TextFunctions.EmailRe, "<EMAIL>"),
          TextFunctions.PhoneRe, "<PHONE>").as("t"))
      .as[(Long, Long, String)].head()
    assert(out._1 === 1)
    assert(out._2 === 1)
    assert(out._3 === "mail <EMAIL> or <PHONE> now")
    // no-match text passes through untouched with zero counts
    val clean = Seq("no contact info here").toDF("text")
      .select(TextFunctions.matchCount(col("text"), TextFunctions.EmailRe).as("e"),
        TextFunctions.redact(col("text"), TextFunctions.EmailRe, "<EMAIL>").as("t"))
      .as[(Long, String)].head()
    assert(clean === ((0L, "no contact info here")))
  }

  test("bigrams: aligned-slice pairs; short arrays -> empty") {
    val out = Seq("a b c d", "a", "").toDF("text")
      .select(TextFunctions.bigrams(
        TextFunctions.words(TextFunctions.normText(col("text")))).as("b"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b", "b c", "c d"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("frameEnergy: per-frame sum of squared bytes, boundary frames, empty payload") {
    import spark.implicits._
    val files = Seq(
      Multimodal.MediaFile(1L, "audio", Array[Byte](1, 2, 3, 4, 5)), // frames [1,2,3,4], [5]
      Multimodal.MediaFile(2L, "audio", Array[Byte](10, 20, 30, 40)), // exactly one frame
      Multimodal.MediaFile(3L, "audio", Array.empty[Byte]),           // no frames
      Multimodal.MediaFile(4L, "audio", Array[Byte](-1)),             // unsigned: 255^2
    ).toDS()
    val out = Multimodal.frameEnergy(files, 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(out === Set(
      (1L, 0, 1L + 4 + 9 + 16), (1L, 1, 25L),
      (2L, 0, 100L + 400 + 900 + 1600),
      (4L, 0, 255L * 255)))
    // a non-positive frame length fails at the driver, not as an obscure
    // grouped(0) error inside an executor task
    val bad = intercept[IllegalArgumentException](Multimodal.frameEnergy(files, 0))
    assert(bad.getMessage.contains("frame length"))
  }

  test("frameAutocorr: lag products over unsigned bytes, short frames score 0") {
    import spark.implicits._
    val files = Seq(
      Multimodal.MediaFile(1L, "audio", Array[Byte](1, 2, 3, 4, 5)), // frames [1,2,3,4],[5]
      Multimodal.MediaFile(2L, "audio", Array[Byte](-1, 2)),          // unsigned: 255*2
    ).toDS()
    val out = Multimodal.frameAutocorr(files, 4, Seq(1, 2))
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(out === Set(
      (1L, 0, 1, 1L * 2 + 2 * 3 + 3 * 4), // lag 1 over [1,2,3,4]
      (1L, 0, 2, 1L * 3 + 2 * 4),          // lag 2
      (1L, 1, 1, 0L), (1L, 1, 2, 0L),      // single-byte frame: no pairs
      (2L, 0, 1, 255L * 2), (2L, 0, 2, 0L)))
    intercept[IllegalArgumentException](Multimodal.frameAutocorr(files, 4, Seq(0)))
  }

  test("tfidfTopK matches a brute-force oracle; empty docs emit nothing") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple date date date unique"),
      (4L, ""),                 // no words -> absent from output
      (5L, "zz zz zz zz zz"))   // single rare word: fewer rows than k is fine
    val d = corpus.toDF("doc_id", "text")
      .withColumn("_ws", TextFunctions.words(TextFunctions.normText(col("text"))))
    val k = 2
    val got = TextFunctions.tfidfTopK(d, col("_ws"), k)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet

    val wordLists = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val tf = wordLists.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, o) => (id, w, o.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, rows) => w -> rows.size.toLong }
    val exp = tf.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
      rows.map { case (_, w, t) => (id, w, t, df(w), t * 1000000L / df(w)) }
        .sortBy { case (_, w, _, _, s) => (-s, w) }
        .take(k).zipWithIndex
        .map { case ((i, w, t, dfv, s), rk) => (i, w, t, dfv, s, rk + 1L) }
    }.toSet
    assert(got === exp)
    assert(!got.exists(_._1 == 4L))
    assert(got.count(_._1 == 5L) === 1)
  }

  test("word_term_counts kernel tf is identical to the exploded groupBy fallback") {
    // the map-side tf kernel must be VALUE-identical to the composable
    // twin — incl. repeated words, empty arrays (no rows), null arrays
    // (no rows), and null elements (grouped under a null word)
    val d = docs.withColumn("_ws",
      TextFunctions.words(TextFunctions.normText(col("text"))))
    val viaKernel = d.select(col("doc_id"),
        explode(call_function("word_term_counts", col("_ws"))).as("_wt"))
      .select(col("doc_id"), col("_wt.word").as("word"), col("_wt.tf").as("tf"))
      .as[(Long, String, Long)].collect().toSet
    val viaFallback = TextFunctions.tfidfTermCountsFallback(d, col("_ws"))
      .as[(Long, String, Long)].collect().toSet
    assert(viaKernel === viaFallback && viaKernel.nonEmpty)
    // hand edge cases through both paths
    val edge = Seq(
      (1L, Seq("a", "b", "a", "a")),
      (2L, Seq.empty[String]),
      (3L, null),
      (4L, Seq("x", null, "x", null))).toDF("doc_id", "ws")
    val ek = edge.select(col("doc_id"),
        explode(call_function("word_term_counts", col("ws"))).as("_wt"))
      .select(col("doc_id"), col("_wt.word").as("word"), col("_wt.tf").as("tf"))
      .as[(Long, Option[String], Long)].collect().toSet
    val ef = TextFunctions.tfidfTermCountsFallback(
        edge.withColumnRenamed("ws", "_w2"), col("_w2"))
      .as[(Long, Option[String], Long)].collect().toSet
    assert(ek === ef)
    assert(ek === Set((1L, Some("a"), 3L), (1L, Some("b"), 1L),
      (4L, Some("x"), 2L), (4L, None, 2L)))
    // end-to-end: tfidfTopK output equals a fallback-built pipeline
    val viaOp = TextFunctions.tfidfTopK(d, col("_ws"), 3)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val tfF = TextFunctions.tfidfTermCountsFallback(d, col("_ws"))
    val dfF = tfF.groupBy("word").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("word"))
    val expOp = tfF.join(dfF, "word")
      .withColumn("score", expr("tf * 1000000L div df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select("doc_id", "word", "tf", "df", "score", "rk")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(viaOp === expOp)
  }

  test("vocabDrift: ppm normalization, new/vanished words, abs-delta order, top-k") {
    val old = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val nw = Seq((2L, "a b b c")).toDF("doc_id", "text")
    val out = TextFunctions.vocabDrift(old, nw, 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    // old: a 750000, b 250000 ppm; new: a/b/c 250000/500000/250000 —
    // c is NEW (old 0); order |delta| desc then word
    assert(out === Seq(
      ("a", 750000L, 250000L, -500000L),
      ("b", 250000L, 500000L, 250000L),
      ("c", 0L, 250000L, 250000L)))
    // top-k cuts after ordering
    assert(TextFunctions.vocabDrift(old, nw, 1)
      .as[(String, Long, Long, Long)].collect().toSeq.map(_._1) === Seq("a"))
    // a vanished word scores 0 new_ppm
    val gone = TextFunctions.vocabDrift(nw, old, 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(gone.exists { case (w, o, n, d) => w == "c" && n == 0L && d == -o })
  }

  test("vocabCoverage: hand oracle incl. empty doc, all-OOV doc, and rank ties") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the"),
      (3L, ""),
      (4L, "zebra unique xylophone")).toDF("doc_id", "text")
    // counts: the=5; cat,mat,on,sat... all 1 -> top-2 = the(r1), cat(r2)
    val out = TextFunctions.vocabCoverage(d, 2).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 6L, 3L, 500L, 133L), // the,the,cat in vocab: ranks 1+1+2 -> mean 1.33
      (2L, 3L, 3L, 0L, 100L),
      (3L, 0L, 0L, 0L, 0L),
      (4L, 3L, 0L, 1000L, 0L)))
  }

  test("vocabCoverage survives a corpus already carrying working-column names") {
    val d = Seq((1L, "one two three", "x", "y", "z"))
      .toDF("doc_id", "text", "_graft_ws", "_graft_word", "_graft_rank")
    val out = TextFunctions.vocabCoverage(d, 2).collect()
    assert(out.length === 1)
  }

  test("bloom prefilter: no false negatives on inserted values; prunes non-members") {
    val vals = (1 to 1000).map(i => s"shingle $i")
    val df = vals.toDF("sh")
    val sketch = df.agg(call_function("bloom_agg", col("sh"), lit(10000L), lit(80000L)))
      .head().getAs[Array[Byte]](0)
    val probe = (1 to 2000).map(i => s"shingle $i").toDF("sh")
      .where(call_function("bloom_contains", lit(sketch), col("sh")))
    val kept = probe.select("sh").as[String].collect().toSet
    assert(vals.toSet.subsetOf(kept), "bloom dropped an inserted value (false negative)")
    // 8 bits/element -> FP rate ~2%; 1000 non-members must not all survive
    assert(kept.size < 1300, s"bloom pruned nothing: ${kept.size} of 2000 kept")
  }

  test("bloom-prefiltered decontamination equals the plain equi-join (p19 == p33)") {
    val a = graft.PipelineQueries.queries("p19_contamination")(spark, sf())
      .as[(Long, Long, Long)].collect().toSeq
    val b = graft.PipelineQueries.queries("p33_contamination_bloom")(spark, sf())
      .as[(Long, Long, Long)].collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("labelCentroidOutliers: hand centroid math incl. negative components and exact-zero dist") {
    val d = Seq(
      (1L, Array(0f, 0f), 0),
      (2L, Array(2f, 0f), 0),
      (3L, Array(-1f, 0f), 0),
      (10L, Array(5f, 5f), 1),
      (11L, Array(5f, 5f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidOutliers(d, 10).orderBy("label", "rk")
      .as[(Int, Long, Long, Long)].collect().toSeq
    // label 0: scaled sum dim0 = 1e6, cnt 3 -> centroid floor-div 333333
    //   dist2: v2 (2e6-333333)^2 > v3 (-1e6-333333)^2 > v1 333333^2
    val c = 333333L
    def sq(x: Long) = x * x
    assert(out === Seq(
      (0, 2L, sq(2000000L - c), 1L),
      (0, 3L, sq(-1000000L - c), 2L),
      (0, 1L, sq(c), 3L),
      // label 1: identical vectors -> exact centroid, dist2 0, id tiebreak
      (1, 10L, 0L, 1L),
      (1, 11L, 0L, 2L)))
  }

  test("labelCentroidOutliers: salted two-phase take equals the naive single take") {
    val a = Similarity.labelCentroidOutliers(embs, 5, salts = 1)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val b = Similarity.labelCentroidOutliers(embs, 5, salts = 16)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("hash split: deterministic buckets in [0,100), 90/5/5 labels") {
    val df = spark.range(1000).select(col("id").as("doc_id"))
      .select(col("doc_id"), TextFunctions.splitBucket(col("doc_id")).as("bucket"))
      .withColumn("split", TextFunctions.splitLabel(col("bucket")))
    val rows = df.as[(Long, Long, String)].collect()
    assert(rows.forall { case (_, b, _) => b >= 0 && b < 100 })
    assert(rows.forall { case (_, b, s) =>
      s == (if (b < 90) "train" else if (b < 95) "val" else "test") })
    // stable under repartitioning (position-independent)
    val re = df.repartition(7).as[(Long, Long, String)].collect()
      .map { case (id, b, s) => id -> (b, s) }.toMap
    rows.foreach { case (id, b, _) => assert(re(id)._1 === b) }
    // all three splits materialize on 1000 ids
    assert(rows.map(_._3).distinct.toSet === Set("train", "val", "test"))
  }

  test("activityCosineTopK matches a brute-force histogram-cosine oracle") {
    // (key, tsUs): deterministic activity with distinct hour profiles
    val rnd = new scala.util.Random(23)
    val hourUs = 3_600_000_000L
    val evs = (1 to 500).map { i =>
      val k = 1L + rnd.nextInt(12)
      // each key favors hours near (k * 2) so profiles genuinely differ;
      // half the days sit BEFORE the epoch — hour binning must be
      // floor-div + non-negative mod, not truncation (the div/% trap)
      val h = (k * 2 + rnd.nextInt(4)) % 24
      val day = i - 250L
      (k, h * hourUs + rnd.nextInt(3_600_000) * 1000L + day * 24L * hourUs)
    }
    val df = evs.toDF("k", "ts")
    val got = Similarity.activityCosineTopK(df, "k", "ts", hourUs,
        col("k") <= 4, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    // brute force in Scala with the identical float recipe and FLOOR bins
    val hist = evs.groupBy(_._1).map { case (k, es) =>
      k -> es.groupBy(e => Math.floorMod(Math.floorDiv(e._2, hourUs), 24L))
        .map { case (h, xs) => h -> xs.size.toLong }
    }
    def nrm(k: Long) = math.sqrt(hist(k).values.map(c => c * c).sum.toDouble)
    val want = hist.keys.filter(_ <= 4).toSeq.sorted.flatMap { q =>
      val sims = hist.keys.filter(_ != q).toSeq.flatMap { n =>
        val dot = hist(q).map { case (h, c) => c * hist(n).getOrElse(h, 0L) }.sum
        if (dot == 0) None // no shared hour bin -> no pair row at all
        else Some(n -> math.floor(1e6 * dot / (nrm(q) * nrm(n))).toLong)
      }
      sims.sortBy { case (n, s) => (-s, n) }.take(3).zipWithIndex
        .map { case ((n, s), i) => (q, i + 1L, n, s) }
    }
    assert(got === want && got.nonEmpty)
  }

  test("fused histogram build equals the cells∘histograms composition") {
    // the LSH index build aggregates raw events in ONE key-keyed
    // exchange (activityHistogramsFromEvents); the two-step composition
    // is the reference — pre-epoch timestamps included so both paths
    // exercise the floor-div + non-negative-mod binning, at the default
    // geometry and a non-default (bins=7 day-of-week over day buckets)
    val rnd = new scala.util.Random(29)
    val hourUs = 3_600_000_000L
    val evs = (1 to 400).map { i =>
      (1L + rnd.nextInt(10), (i - 200L) * hourUs / 2 + rnd.nextInt(1000) * 1000L)
    }
    val df = evs.toDF("k", "ts")
    // bins=168 is the README-advertised hour-of-week geometry: past the
    // codegen field limit the build routes to the bin_count_agg kernel
    // (O(1)-per-row imperative buffer, one exchange of array partials —
    // probed 2-4x faster than BOTH composable forms at every factor), so
    // pin parity there too and pin each route's plan shape.
    // codegen.fallback=false makes a janino compile failure THROW
    // instead of silently interpreting.
    val priorFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      for ((unit, bins) <- Seq((hourUs, 24), (24L * hourUs, 7), (hourUs, 168))) {
        // keep ONE dataset and read the plan off the instance that ran,
        // so the adaptive plan is final and carries the codegen spans
        val fusedDs = Similarity
          .activityHistogramsFromEvents(df, "k", "ts", unit, bins)
          .as[(Long, Seq[Long])]
        val fused = fusedDs.collect().toMap
        val twoStep = Similarity.activityHistograms(
            Similarity.activityCells(df, "k", "ts", unit, bins), "k", bins)
          .as[(Long, Seq[Long])].collect().toMap
        assert(fused.nonEmpty && fused === twoStep, s"bins=$bins diverged")
        // the adaptive plan string carries BOTH the Final and the (never
        // codegen-annotated) Initial plan — judge the Final section only.
        // The final plan marks whole-stage-codegen'd operators with the
        // `*(id)` prefix; within the codegen field limit (<= 100) the
        // fused single-exchange aggregate must be FULLY codegen'd; past
        // it the kernel route is ObjectHashAggregate (imperative buffer,
        // never codegen'd) — still exactly ONE exchange either way
        val plan = fusedDs.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(exchanges == 1,
          s"bins=$bins: expected ONE key exchange, got $exchanges:\n$plan")
        if (bins <= 100) {
          assert(plan.contains("HashAggregate") && !plan.contains("ObjectHashAggregate"),
            s"bins=$bins: expected a plain HashAggregate, got:\n$plan")
          val aggs = "HashAggregate\\(".r.findAllIn(plan).size
          val starred = "\\*\\(\\d+\\) HashAggregate\\(".r.findAllIn(plan).size
          assert(aggs >= 2 && starred == aggs,
            s"bins=$bins: $starred of $aggs HashAggregates codegen'd:\n$plan")
        } else
          assert("ObjectHashAggregate\\(".r.findAllIn(plan).size >= 2 &&
            plan.contains("bin_count_agg"),
            s"bins=$bins: expected the two-phase bin_count_agg kernel:\n$plan")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", priorFallback)
    intercept[IllegalArgumentException](
      Similarity.activityHistogramsFromEvents(df, "k", "ts", 0L, 24))
    intercept[IllegalArgumentException](
      Similarity.activityCells(df, "k", "ts", 0L, 24))
  }

  test("bin_count_agg kernel: null/out-of-range bins drop, merge is partition-independent") {
    // direct-call contract beyond what the routed parity covers: a null
    // bin and an out-of-range bin must contribute nothing (the
    // conditional-sum formulation's when(bin === h) matches no branch),
    // and the imperative buffers must merge identically at any
    // partitioning
    val rows = Seq[(Long, java.lang.Long)](
      (1L, 0L), (1L, 0L), (1L, 3L), (1L, null), (1L, 7L), (1L, -1L),
      (2L, 3L), (2L, 3L), (2L, 3L))
    val df = rows.toDF("k", "bin")
    def hist(parts: Int): Map[Long, Seq[Long]] =
      df.repartition(parts).groupBy($"k")
        .agg(call_function("bin_count_agg", $"bin", lit(4)).as("hist"))
        .as[(Long, Seq[Long])].collect().toMap
    val expected = Map(
      1L -> Seq(2L, 0L, 0L, 1L), // null, 7 (>= bins) and -1 all dropped
      2L -> Seq(0L, 0L, 0L, 3L))
    assert(hist(1) === expected)
    assert(hist(7) === expected) // forces cross-partition buffer merges
    // non-foldable bins argument fails at analysis, not mid-job
    intercept[org.apache.spark.sql.AnalysisException](
      df.groupBy($"k").agg(call_function("bin_count_agg", $"bin", $"k")).collect())
  }

  test("activityCosineTopK: salted join equals the unsalted (parallelism knob, not semantics)") {
    val rnd = new scala.util.Random(31)
    val hourUs = 3_600_000_000L
    val evs = (1 to 600).map { i =>
      (1L + rnd.nextInt(15), rnd.nextInt(24).toLong * hourUs +
        rnd.nextInt(10).toLong * 24L * hourUs + rnd.nextInt(3600) * 1000000L)
    }
    val df = evs.toDF("k", "ts")
    val plain = Similarity.activityCosineTopK(df, "k", "ts", hourUs, col("k") <= 5, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    val salted = Similarity.activityCosineTopK(df, "k", "ts", hourUs, col("k") <= 5, 3,
        salts = 16)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(plain === salted && plain.nonEmpty)
  }

  test("activityCosineTopKLsh: emitted sims are exact, archetype recall high") {
    // 48 keys in 4 diurnal archetypes (night/morning/afternoon/evening):
    // the population structure real user activity has, and the case the
    // scale path must get right — same-archetype keys collide in the
    // sign-LSH buckets, so the true top-3 (always same-archetype here)
    // survives candidate pruning
    val rnd = new scala.util.Random(7)
    val hourUs = 3_600_000_000L
    val evs = for {
      k <- 0 until 48
      i <- 0 until 40
    } yield {
      val h = ((k % 4) * 6 + rnd.nextInt(6)) % 24
      val day = rnd.nextInt(20).toLong
      (k.toLong, day * 24L * hourUs + h * hourUs + rnd.nextInt(3600) * 1000000L)
    }
    val df = evs.toDF("k", "ts")
    val pred = col("k") < 8
    val exact = Similarity.activityCosineTopK(df, "k", "ts", hourUs, pred, 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.activityCosineTopKLsh(df, "k", "ts", hourUs, pred, 3)
      .select("q_id", "n_id", "sim_micro").as[(Long, Long, Long)].collect().toSeq
    // verify-on-candidates contract: every emitted sim equals the
    // exhaustive route's sim for that pair (k large => all shared-bin pairs)
    val allSims = Similarity.activityCosineTopK(df, "k", "ts", hourUs, pred, 1000000)
      .select("q_id", "n_id", "sim_micro").as[(Long, Long, Long)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    lsh.foreach { case (q, n, s) =>
      assert(allSims.get((q, n)).forall(_ == s), s"sim mismatch for ($q,$n)") }
    val recall = (exact intersect lsh.map(t => (t._1, t._2)).toSet).size.toDouble / exact.size
    info(f"activity lsh archetype recall=$recall%.2f")
    assert(recall >= 0.8)
  }

  test("activityLshIndex: probing the persisted index equals the direct route; disjoint indexes union") {
    val rnd = new scala.util.Random(13)
    val hourUs = 3_600_000_000L
    val evs = (1 to 800).map { i =>
      (1L + rnd.nextInt(30), rnd.nextInt(24).toLong * hourUs +
        rnd.nextInt(12).toLong * 24L * hourUs + rnd.nextInt(3600) * 1000000L)
    }
    val df = evs.toDF("k", "ts")
    val direct = Similarity.activityCosineTopKLsh(df, "k", "ts", hourUs, col("k") <= 6, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_actidx").toString
    Similarity.activityLshIndex(df, "k", "ts", hourUs).write.mode("overwrite").parquet(dir)
    val probed = Similarity.activityCosineTopKLshProbe(
        spark.read.parquet(dir), "k", col("k") <= 6, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(direct === probed && direct.nonEmpty)
    // incremental-ingest shape: key-disjoint halves index independently,
    // union of the halves == the whole-corpus index
    val lo = Similarity.activityLshIndex(df.where(col("k") <= 15), "k", "ts", hourUs)
    val hi = Similarity.activityLshIndex(df.where(col("k") > 15), "k", "ts", hourUs)
    val merged = Similarity.activityCosineTopKLshProbe(
        lo.unionByName(hi), "k", col("k") <= 6, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(merged === direct)
  }

  test("activityLshIndexMerge: a key active in BOTH increments probes identically to a single build") {
    // the returning-key case a plain union gets WRONG (two divergent
    // index rows per returning key, no merge path): split by TIME, so
    // most keys appear in both halves — the SketchMaintain increments ==
    // one-shot pattern applied to the activity index
    val rnd = new scala.util.Random(29)
    val hourUs = 3_600_000_000L
    val evs = (1 to 900).map { _ =>
      (1L + rnd.nextInt(25), rnd.nextInt(24).toLong * hourUs +
        rnd.nextInt(14).toLong * 24L * hourUs + rnd.nextInt(3600) * 1000000L)
    }
    val df = evs.toDF("k", "ts")
    val cut = 7L * 24L * hourUs
    val early = Similarity.activityLshIndex(df.where(col("ts") < cut), "k", "ts", hourUs)
    val late = Similarity.activityLshIndex(df.where(col("ts") >= cut), "k", "ts", hourUs)
    // both halves non-trivial and overlapping in keys, or the test is vacuous
    val overlap = early.select("k").intersect(late.select("k")).count()
    assert(overlap >= 20, s"fixture must have returning keys, got $overlap")
    val merged = Similarity.activityLshIndexMerge(early.unionByName(late), "k")
    val whole = Similarity.activityLshIndex(df, "k", "ts", hourUs)
    // index-row parity: histogram, norm, and every bucket signature
    val asMap = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("k"), col("hist"), col("nrm"), col("bucketsigs"))
        .as[(Long, Seq[Long], Double, Seq[Long])].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(asMap(merged) === asMap(whole))
    // probe parity end-to-end
    val pm = Similarity.activityCosineTopKLshProbe(merged, "k", col("k") <= 6, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    val pw = Similarity.activityCosineTopKLshProbe(whole, "k", col("k") <= 6, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(pm === pw && pm.nonEmpty)
    // merge is idempotent over an already-merged index (one part per key)
    val again = Similarity.activityLshIndexMerge(merged, "k")
    assert(asMap(again) === asMap(whole))
  }

  test("activityCosineTopKLshProbe: broadcastQueries=false path is output-identical") {
    val rnd = new scala.util.Random(31)
    val hourUs = 3_600_000_000L
    val evs = (1 to 700).map { _ =>
      (1L + rnd.nextInt(28), rnd.nextInt(24).toLong * hourUs +
        rnd.nextInt(10).toLong * 24L * hourUs + rnd.nextInt(3600) * 1000000L)
    }
    val df = evs.toDF("k", "ts")
    val idx = Similarity.activityLshIndex(df, "k", "ts", hourUs)
    val hinted = Similarity.activityCosineTopKLshProbe(idx, "k", col("k") <= 6, 3)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    val shuffled = Similarity.activityCosineTopKLshProbe(idx, "k", col("k") <= 6, 3,
        broadcastQueries = false)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(hinted === shuffled && hinted.nonEmpty)
    // and through the end-to-end wrapper
    val viaLsh = Similarity.activityCosineTopKLsh(df, "k", "ts", hourUs,
        col("k") <= 6, 3, broadcastQueries = false)
      .orderBy("q_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaLsh === hinted)
  }

  test("activity bins generalize: 168-bin hour-of-week routes agree (exact vs LSH verify contract)") {
    val rnd = new scala.util.Random(37)
    val hourUs = 3_600_000_000L
    // weekly structure: each key's activity concentrates on its own
    // day-of-week, invisible at 24 bins but separable at 168
    val evs = for { k <- 0 until 20; i <- 0 until 30 } yield {
      val day = k % 7
      (k.toLong, (rnd.nextInt(6).toLong * 7L + day) * 24L * hourUs +
        rnd.nextInt(24).toLong * hourUs + rnd.nextInt(3600) * 1000000L)
    }
    val df = evs.toDF("k", "ts")
    val pred = col("k") < 5
    val exact = Similarity.activityCosineTopK(df, "k", "ts", hourUs, pred,
        1000000, bins = 168)
      .select("q_id", "n_id", "sim_micro").as[(Long, Long, Long)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    val lsh = Similarity.activityCosineTopKLsh(df, "k", "ts", hourUs, pred, 3,
        bins = 168)
      .select("q_id", "n_id", "sim_micro").as[(Long, Long, Long)].collect().toSeq
    assert(lsh.nonEmpty)
    // verify contract at 168 bins: every emitted sim equals the exhaustive
    // route's for bin-sharing pairs; a candidate sharing NO bin (possible —
    // sign-LSH buckets, not bins, gate candidacy) must carry sim 0
    lsh.foreach { case (q, n, s) =>
      exact.get((q, n)) match {
        case Some(e) => assert(e === s, s"sim mismatch for ($q,$n)")
        case None => assert(s === 0L, s"bin-disjoint pair ($q,$n) must score 0")
      }
    }
    // the weekly structure is VISIBLE at 168 bins (it is invisible at 24,
    // where day-of-week aliases away): bins are day-disjoint by fixture
    // construction, so every positive-sim neighbor is same-day, and every
    // query's top-1 is a positive same-day hit
    lsh.filter(_._3 > 0).foreach { case (q, n, _) => assert(q % 7 === n % 7) }
    val top1 = lsh.groupBy(_._1).map(_._2.maxBy(_._3)).toSeq
    assert(top1.size === 5)
    top1.foreach { case (q, n, s) => assert(s > 0 && q % 7 === n % 7) }
  }

  test("activityCosineTopKLsh: real candidate pruning on unstructured activity") {
    // near-uniform random activity — every pair shares bins, so the
    // exhaustive route compares every (query, key) pair; the LSH route
    // must still compare strictly fewer (bucket collisions only)
    val rnd = new scala.util.Random(11)
    val hourUs = 3_600_000_000L
    val evs = for { k <- 0 until 60; i <- 0 until 48 } yield
      (k.toLong, rnd.nextInt(24).toLong * hourUs +
        rnd.nextInt(20).toLong * 24L * hourUs + rnd.nextInt(3600) * 1000000L)
    val df = evs.toDF("k", "ts")
    val pred = col("k") < 10
    // k huge => the full candidate/compare sets, not the top-3
    val exhaustivePairs = Similarity.activityCosineTopK(
      df, "k", "ts", hourUs, pred, 1000000).count()
    val lshPairs = Similarity.activityCosineTopKLsh(
      df, "k", "ts", hourUs, pred, 1000000).count()
    info(s"exhaustive compares=$exhaustivePairs lsh compares=$lshPairs")
    assert(exhaustivePairs === 10L * 59) // uniform: every pair shares bins
    assert(lshPairs < exhaustivePairs)
  }

  test("langid confusion matrix partitions the corpus; guesses come from the marker set") {
    val m = TextFunctions.langGuess _
    val matrix = docs
      .withColumn("lang_guess", m(TextFunctions.words(TextFunctions.normText(col("text")))))
      .groupBy("lang", "lang_guess").agg(count(lit(1)).as("n_docs"))
      .as[(String, String, Long)].collect().toSeq
    assert(matrix.map(_._3).sum === docs.count())
    val guessable = TextFunctions.LangMarkers.map(_._1).toSet + "und"
    assert(matrix.map(_._2).toSet.subsetOf(guessable))
    // no diagonal assertion ON PURPOSE: the synthetic corpus' `lang`
    // labels are decorative (every label's docs draw the same
    // English-ish vocabulary — labeled-fr docs contain " the " as often
    // as labeled-en), and the confusion matrix correctly REVEALS that:
    // the en column dominates every row. That revelation is exactly what
    // the evaluation artifact is for.
    val en = matrix.filter(_._2 == "en").map(_._3).sum
    assert(en * 2 > docs.count(), s"expected en-dominated matrix, got $matrix")
  }

  test("bigramLmScore: mean transition ppm under the corpus' own bigram model") {
    // model: 'the cat' 2/3, 'cat sat'/'cat ran' 1/2, 'the dog' 1/3,
    // 'dog sat' 1/1 (prefix counts: the=3, cat=2, dog=1)
    val d = Seq(
      (1L, "The cat sat"), (2L, "the cat ran!"), (3L, "the dog sat"),
      (4L, "solo"), (5L, "")).toDF("doc_id", "text")
    val got = TextFunctions.bigramLmScore(d).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, (666666L + 500000L) / 2),   // 583333
      (2L, 2L, (666666L + 500000L) / 2),
      (3L, 2L, (333333L + 1000000L) / 2),  // 666666
      (4L, 0L, 0L), (5L, 0L, 0L)))
    // corpus run: scores are valid ppm and every multi-word doc is scored
    val corpus = TextFunctions.bigramLmScore(docs)
    assert(corpus.where(col("score_ppm") < 0 || col("score_ppm") > 1000000L).count() === 0)
    assert(corpus.where(col("n_bigrams") > 0 && col("score_ppm") === 0).count() === 0)
    assert(corpus.count() === docs.count())
  }
}
