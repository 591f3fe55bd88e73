package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-9 pipeline additions: context-window chunking, mixture
  * weights, int8 quantization audit, nearest-rank quantiles. */
class ChunkMixQuantSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())
  private lazy val embs = Tables.embeddings(spark, sf())

  test("chunkFixed: chunks reconstruct the document and overlap by len-stride") {
    val src = Seq((1L, "a" * 500), (2L, "xyz"), (3L, "")).toDF("doc_id", "text")
    val ch = TextFunctions.chunkFixed(src, 200, 150).orderBy("doc_id", "chunk_ix")
      .as[(Long, Long, Long, String, Long)].collect()
    val d1 = ch.filter(_._1 == 1L)
    // starts 0,150,300,450; lengths 200,200,200,50
    assert(d1.map(_._3).toSeq === Seq(0L, 150L, 300L, 450L))
    assert(d1.map(_._5).toSeq === Seq(200L, 200L, 200L, 50L))
    // consecutive chunks agree on the 50-char overlap
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.drop(150) === b._4.take(a._4.length - 150))
    }
    // short doc -> one chunk, the text itself; empty doc -> one empty chunk
    assert(ch.filter(_._1 == 2L).map(_._4).toSeq === Seq("xyz"))
    assert(ch.filter(_._1 == 3L).map(_._4).toSeq === Seq(""))
  }

  test("chunkFixed on the corpus: per-doc chunk count matches the closed form") {
    val got = TextFunctions.chunkFixed(docs, 200, 150)
      .groupBy("doc_id").agg(count(lit(1)).as("chunks"))
    val want = docs.select(col("doc_id"),
      (floor(greatest(length(col("text")) - 1, lit(0)) / 150) + 1).as("chunks"))
    assert(got.join(want, Seq("doc_id", "chunks")).count() === docs.count())
  }

  test("mixtureWeights: weights sum to ~1e6 and sqrt damping lifts the tail") {
    val w = TextFunctions.mixtureWeights(docs)
      .select("source", "tokens", "weight_ppm")
      .as[(String, Long, Long)].collect()
    val totalPpm = w.map(_._3).sum
    assert(totalPpm <= 1000000L && totalPpm > 1000000L - w.length * 2) // floor slack
    // sqrt damping: every source's weight share is pulled toward 1/k
    // relative to its raw token share — strictly up for below-average
    // sources, strictly down for above-average ones
    val totalTok = w.map(_._2).sum.toDouble
    w.foreach { case (_, tok, ppm) =>
      val raw = tok / totalTok
      val damped = ppm / 1e6
      // floor() can cost up to ~1ppm each way, hence the 2e-6 slack
      if (raw < 1.0 / w.length) assert(damped > raw - 2e-6)
      else if (raw > 1.0 / w.length) assert(damped < raw + 2e-6)
    }
    // damping preserves the source ordering by size
    assert(w.sortBy(_._2).map(_._1).toSeq === w.sortBy(_._3).map(_._1).toSeq)
  }

  test("quantizeInt8Summary: digests bounded by dim, zero vector safe") {
    val q = Similarity.quantizeInt8Summary(embs)
    val bad = q.where(col("q_min") < -127 || col("q_max") > 127 ||
      col("q_sq_sum") > col("dim") * 127L * 127L || col("scale_micro") < 0)
    assert(bad.count() === 0)
    // a unit-amax component must hit ±127 exactly: quantize a known vector
    val one = Seq((0L, Array(0.5f, -1.0f, 0.25f)), (1L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8Summary(one).orderBy("vec_id")
      .select("q_min", "q_max", "q_sum").as[(Long, Long, Long)].collect()
    assert(r(0) === ((-127L, 64L, 64L - 127L + 32L))) // floor(.5*127+.5)=64, floor(.25*127+.5)=32
    assert(r(1) === ((0L, 0L, 0L)))
  }

  test("groupQuantiles: nearest-rank values are actual member values at the right rank") {
    val df = Seq.tabulate(100)(i => ("s", i + 1L)).toDF("source", "n_chars")
    val r = TextFunctions.groupQuantiles(df, "source", "n_chars",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .select("n_rows", "p50", "p90", "p99").as[(Long, Long, Long, Long)].head()
    assert(r === ((100L, 50L, 90L, 99L)))
  }

  test("mixtureSample keeps exactly the residue-below-weight rows of every source") {
    val rates = TextFunctions.mixtureWeights(docs)
      .select(col("source"), col("weight_ppm"))
    val kept = TextFunctions.mixtureSample(docs)
      .select("doc_id").as[Long].collect().toSet
    val want = docs.join(rates, "source")
      .where(TextFunctions.sampleResidue(col("doc_id")) < col("weight_ppm"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === want)
    // a genuine draw: something kept, something dropped
    assert(kept.nonEmpty && kept.size < docs.count())
    // deterministic under repartitioning (hash, not position)
    val re = TextFunctions.mixtureSample(docs.repartition(7))
      .select("doc_id").as[Long].collect().toSet
    assert(re === kept)
  }
}
