package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over the text kernel: the invariants the DuckDB oracle
  * parity and the 100 TB determinism story rest on, for ANY input text —
  * not just the synthetic corpus. All samples for a property run as ONE
  * Spark job (per-sample jobs were pure scheduling overhead). */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample batch: n draws with fixed seeds, flattened. */
  private def samples[A](gen: Gen[List[A]], n: Int = 12): List[A] =
    (1 to n).toList.flatMap { i =>
      gen.pureApply(Gen.Parameters.default.withSize(6 + i * 4), Seed(i.toLong))
    }

  // mixed printable garbage: unicode, punctuation, whitespace runs
  private val genText: Gen[List[String]] =
    Gen.listOfN(8, Gen.frequency(
      6 -> Gen.asciiPrintableStr,
      2 -> Gen.listOfN(12, Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString),
      2 -> Gen.oneOf("", "   ", "a  b\t\nc", "ALL CAPS 42!", "é ü ñ 漢字")))

  private lazy val texts: List[String] = samples(genText)

  test("normText is idempotent and its alphabet is [a-z0-9 ]") {
    val out = texts.toDF("text")
      .select(TextFunctions.normText(col("text")).as("n1"))
      .withColumn("n2", TextFunctions.normText(col("n1")))
      .as[(String, String)].collect()
    out.foreach { case (n1, n2) =>
      assert(n1 === n2, "idempotence")
      assert(n1.matches("[a-z0-9 ]*") && !n1.startsWith(" ") && !n1.endsWith(" "))
    }
  }

  test("words ⨝ ' ' reconstructs the normalized text; counts agree") {
    val out = texts.toDF("text")
      .withColumn("norm", TextFunctions.normText(col("text")))
      .withColumn("ws", TextFunctions.words(col("norm")))
      .select(col("norm"), concat_ws(" ", col("ws")).as("joined"),
        TextFunctions.wordCount(col("ws")).as("cnt"), size(col("ws")).as("sz"))
      .as[(String, String, Long, Int)].collect()
    out.foreach { case (norm, joined, cnt, sz) =>
      assert(joined === norm)
      assert(cnt === sz.toLong)
    }
  }

  test("rollingHash lands in [0, mod) for any input (ANSI-overflow-safe)") {
    val hs = texts.toDF("text")
      .select(TextFunctions.rollingHash(TextFunctions.normText(col("text"))).as("h"))
      .as[Long].collect()
    assert(hs.length === texts.length)
    hs.foreach(h => assert(h >= 0L && h < TextFunctions.RollHashMod))
  }

  test("splitBucket ∈ [0,100) and splitLabel partitions it for any id") {
    val ids = samples(Gen.listOfN(20, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)), n = 6)
    val out = ids.toDF("id")
      .select(TextFunctions.splitBucket(col("id")).as("b"))
      .withColumn("s", TextFunctions.splitLabel(col("b")))
      .as[(Long, String)].collect()
    assert(out.length === ids.length)
    out.foreach { case (b, s) =>
      assert(b >= 0 && b < 100, s"bucket $b out of range")
      assert(s === (if (b < 90) "train" else if (b < 95) "val" else "test"))
    }
  }

  test("bigram/trigram cardinalities: n-1 bigrams; distinct trigrams <= n-2") {
    val out = texts.toDF("text")
      .withColumn("ws", TextFunctions.words(TextFunctions.normText(col("text"))))
      .select(size(col("ws")).as("n"),
        size(TextFunctions.bigrams(col("ws"))).as("nb"),
        size(TextFunctions.trigramShingles(col("ws"))).as("nt"))
      .as[(Int, Int, Int)].collect()
    out.foreach { case (n, nb, nt) =>
      assert(nb === math.max(0, n - 1))
      assert(nt <= math.max(0, n - 2)) // distinct -> can only shrink
    }
  }

  test("redact is a no-op exactly when matchCount is zero") {
    val out = texts.toDF("text")
      .select(col("text"),
        TextFunctions.matchCount(col("text"), TextFunctions.EmailRe).as("c"),
        TextFunctions.redact(col("text"), TextFunctions.EmailRe, "<EMAIL>").as("r"))
      .as[(String, Long, String)].collect()
    out.foreach { case (t, c, r) =>
      if (c == 0) assert(r === t) else assert(r.contains("<EMAIL>") && r != t)
    }
  }

  test("trigram_shingles native ≡ composable for arbitrary unicode text") {
    val df = texts.toDF("text")
    val native = df.selectExpr("trigram_shingles(text) AS shs")
      .as[Seq[String]].collect().toSeq
    val composable = df
      .withColumn("_ws", TextFunctions.words(TextFunctions.normText(col("text"))))
      .select(TextFunctions.trigramShingles(col("_ws")).as("shs"))
      .as[Seq[String]].collect().toSeq
    assert(native.length === texts.length && native === composable)
  }

  test("word_stats native ≡ composable for arbitrary text incl. trailing \\t/\\n") {
    // trailing non-0x20 whitespace mutations: split keeps the trailing
    // empty token (limit -1), so ws_tokens must count it too
    val wsTexts: List[String] = texts ++
      texts.map(_ + "\n") ++ texts.map(_ + "\t") ++
      texts.map(t => "\u000b" + t + " \r\n") ++
      List("hello\n", "\t", "hello \nworld\t", "\f", " \n ")
    val df = wsTexts.toDF("text")
    val native = df.selectExpr("word_stats(text) AS s")
      .select("s.word_cnt", "s.alpha_chars", "s.stop_hits", "s.lang_guess",
        "s.ws_tokens", "s.bpe_tokens")
      .as[(Long, Long, Long, String, Long, Long)].collect().toSeq
    val composable = df
      .withColumn("norm", TextFunctions.normText(col("text")))
      .withColumn("ws", TextFunctions.words(col("norm")))
      .select(TextFunctions.wordCount(col("ws")).as("wc"),
        TextFunctions.alphaChars(col("norm")).as("ac"),
        TextFunctions.setHits(col("ws"), TextFunctions.Stopwords).as("sh"),
        TextFunctions.langGuess(col("ws")).as("lg"),
        TextFunctions.wsTokenCount(col("text")).as("wt"),
        TextFunctions.bpeTokenCount(col("text")).as("bt"))
      .as[(Long, Long, Long, String, Long, Long)].collect().toSeq
    assert(native.length === wsTexts.length && native === composable)
  }

  test("word_term_counts ≡ exploded groupBy for arbitrary word arrays") {
    // per-doc term counts computed map-side by the kernel must match the
    // composable explode + groupBy for ANY array: unicode words, repeats,
    // empty strings as elements, empty arrays
    val arrays: List[Seq[String]] =
      texts.map(_.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)) ++
        List(Seq.empty, Seq("a", "a", "a"), Seq("", "a", ""), Seq("é", "é", "x"))
    val df = arrays.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }.toDF("doc_id", "ws")
    val native = df
      .select(col("doc_id"), explode(call_function("word_term_counts", col("ws"))).as("_wt"))
      .select(col("doc_id"), col("_wt.word"), col("_wt.tf"))
      .as[(Long, String, Long)].collect().toSet
    val composable = df
      .select(col("doc_id"), explode(col("ws")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(native === composable)
    // per-doc invariant: tf sums to the array length, words are distinct
    val byDoc = native.groupBy(_._1)
    arrays.zipWithIndex.foreach { case (ws, i) =>
      val rows = byDoc.getOrElse(i.toLong, Set.empty).toSeq
      assert(rows.map(_._3).sum === ws.size.toLong, s"doc $i tf sum")
      assert(rows.map(_._2).distinct.size === rows.size, s"doc $i word distinctness")
    }
  }

  test("char_hist16 native ≡ composable ascii%16 counts for arbitrary unicode text") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df
      .select(col("doc_id"),
        posexplode(call_function("char_hist16", col("text"))).as(Seq("bin", "cnt")))
      .where(col("cnt") > 0)
      .as[(Long, Int, Long)].collect().toSet
    val composable = df
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .where(col("c") =!= "")
      .groupBy(col("doc_id"), (ascii(col("c")) % 16).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .as[(Long, Int, Long)].collect().toSet
    assert(native === composable)
  }

  test("word_rep_stats native ≡ composable counts for arbitrary unicode text") {
    val df = texts.toDF("text")
    val native = df
      .selectExpr("word_rep_stats(text) AS s")
      .select("s.total", "s.dst", "s.top", "s.btotal", "s.btop")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val ws = df.withColumn("ws", TextFunctions.words(TextFunctions.normText(col("text"))))
    val composable = ws.select(
        TextFunctions.wordCount(col("ws")).as("total"),
        size(array_distinct(col("ws"))).cast("long").as("dst"),
        coalesce(array_max(transform(array_distinct(col("ws")),
          w => size(filter(col("ws"), x => x === w)))), lit(0)).cast("long").as("top"),
        size(TextFunctions.bigrams(col("ws"))).cast("long").as("btotal"),
        coalesce(array_max(transform(array_distinct(TextFunctions.bigrams(col("ws"))),
          b => size(filter(TextFunctions.bigrams(col("ws")), x => x === b)))), lit(0))
          .cast("long").as("btop"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(native.length === texts.length && native === composable)
  }

  test("substring-overlap anchoring is shift-invariant: a shared span pairs at ANY offset") {
    // the property the first (fixed-stride) implementation violated: two
    // docs embedding the same long span at arbitrary, unrelated offsets
    // must always pair
    val span = ("solar panels convert sunlight into electricity using layered " +
      "silicon cells that release electrons when photons strike them")
    val rnd = new scala.util.Random(808)
    def filler(words: Int): String =
      (1 to words).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    val docs = (1 to 8).map { i =>
      (i.toLong, s"${filler(rnd.nextInt(40) + 1)} $span ${filler(rnd.nextInt(40) + 1)}")
    } :+ ((99L, filler(120))) // no span -> must pair with nobody
    val got = Dedup.substringOverlapPairs(docs.toDF("doc_id", "text"),
        windowLen = 48, minShared = 2L)
      .as[(Long, Long, Long)].collect()
    val expectedPairs = for (a <- 1 to 8; b <- (a + 1) to 8) yield (a.toLong, b.toLong)
    assert(got.map(p => (p._1, p._2)).toSet === expectedPairs.toSet)
    assert(!got.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("sampleResidue is uniform enough for stratified rates on arbitrary id shapes") {
    // the balancedSample contract leans on the mixed residue being
    // uniform for ANY id population — short dense ids (the counterexample
    // that broke the unmixed residue: a 3-digit id hashes below 57k),
    // sparse ids, and huge ids alike
    val pops = Seq(
      ("dense", (1L to 4000L).toSeq),
      ("strided", (1L to 4000L).map(_ * 7919L)),
      ("huge", (1L to 4000L).map(_ + 4611686018427387000L)))
    pops.foreach { case (tag, ids) =>
      val res = ids.toDF("id")
        .select(TextFunctions.sampleResidue(col("id")).as("r")).as[Long].collect()
      assert(res.forall(r => r >= 0 && r < TextFunctions.SampleResidue), tag)
      // a 30% rate keeps 30% ± 5 points
      val rate = TextFunctions.SampleResidue * 3 / 10
      val kept = res.count(_ < rate).toDouble / res.length
      assert(math.abs(kept - 0.3) < 0.05, s"$tag kept fraction $kept")
      // and the residues are collision-light (mixing is a bijection on
      // the hash, so duplicates only arise from hash collisions)
      assert(res.distinct.length > res.length * 9 / 10, tag)
    }
  }
}
