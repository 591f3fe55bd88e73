package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.functions._

/** The maintained-sketch ingest loop: increments fold into exactly the
  * one-shot sketches, rounds replay after a crash, config drift is
  * refused, and the candidate floor keeps late-blooming heavy hitters. */
class SketchMaintainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tok = Tables.documents(spark, sf())
    .select(col("source"), explode(TextFunctions.words(
      TextFunctions.normText(col("text")))).as("w"))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("sketch_maintain").toString

  test("three increments equal the one-shot sketches over the union") {
    val dirS = tmp()
    (0 until 3).foreach { i =>
      val r = SketchMaintain.advance(spark,
        tok.where(pmod(crc32(col("w")), lit(3)) === i), "source", "w", dirS)
      r.commit()
      assert(r.round === i.toLong)
    }
    // CMS cells: cell-wise identical to the whole-stream sketch
    val whole = Sketches.cmsPartial(tok.select(col("w").as("_v")), col("_v"))
      .orderBy("_j", "_b").as[(Int, Long, Long)].collect().toSeq
    val lastDir = new java.io.File(dirS).listFiles().map(_.getName)
      .filter(_.startsWith("round_")).sorted.last
    val stored = spark.read.parquet(s"$dirS/$lastDir/cms")
      .orderBy("_j", "_b").as[(Int, Long, Long)].collect().toSeq
    assert(stored === whole)
    // KMV report: identical to the one-shot distinct sketch
    val kmvWhole = Sketches.kmvDistinct(tok, "source", col("w"))
      .orderBy("source").collect().toSeq
    val kmvStored = SketchMaintain.distinctReport(spark, dirS)
      .orderBy("source").collect().toSeq
    assert(kmvStored === kmvWhole)
    // heavy hitters: recall of the true set is perfect, estimates match
    // the batch form (identical merged cells)
    val support = 5
    val n = tok.count()
    val trueHh = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") * 1000 >= lit(n) * support).select("w")
      .as[String].collect().toSet
    val batch = Sketches.heavyHitters(tok.select(col("w").as("_v")),
      col("_v"), support).as[(String, Long)].collect().toMap
    val maintained = SketchMaintain.heavyHitters(spark, dirS, support)
      .as[(String, Long)].collect().toMap
    assert(trueHh.subsetOf(maintained.keySet))
    assert(maintained.keySet.subsetOf(batch.keySet))
    maintained.foreach { case (t, e) => assert(batch(t) === e) }
  }

  test("uncommitted round is swept and the round replays identically") {
    val dirS = tmp()
    val inc0 = tok.where(col("w") < "m")
    SketchMaintain.advance(spark, inc0, "source", "w", dirS).commit()
    val inc1 = tok.where(col("w") >= "m")
    val crashed = SketchMaintain.advance(spark, inc1, "source", "w", dirS)
    // no commit: the next advance must sweep round_1 and reuse its number
    val replay = SketchMaintain.advance(spark, inc1, "source", "w", dirS)
    assert(crashed.round === 1L && replay.round === 1L)
    val a = replay.cms.orderBy("_j", "_b").collect().toSeq
    replay.commit()
    val whole = Sketches.cmsPartial(tok.select(col("w").as("_v")), col("_v"))
      .orderBy("_j", "_b").collect().toSeq
    assert(a === whole)
  }

  test("a config change across rounds is refused") {
    val dirS = tmp()
    SketchMaintain.advance(spark, tok, "source", "w", dirS).commit()
    intercept[IllegalArgumentException] {
      SketchMaintain.advance(spark, tok, "source", "w", dirS, width = 2048)
    }
  }

  test("an item crossing the threshold in a later round is recalled; query below floor refused") {
    val dirS = tmp()
    // round 0: "late" is 1 of 2001 values (0.5 permille) -> pruned at floor 1
    val r0 = (1 to 2000).map(i => ("s", s"bulk$i")) :+ (("s", "late"))
    SketchMaintain.advance(spark, r0.toDF("source", "w"), "source", "w", dirS).commit()
    assert(SketchMaintain.heavyHitters(spark, dirS, 100).count() === 0)
    // round 1: "late" floods in -> overall share ~17% must be recalled
    val r1 = (1 to 500).map(_ => ("s", "late"))
    SketchMaintain.advance(spark, r1.toDF("source", "w"), "source", "w", dirS).commit()
    val hh = SketchMaintain.heavyHitters(spark, dirS, 100)
      .as[(String, Long)].collect().toMap
    assert(hh.keySet === Set("late"))
    assert(hh("late") >= 501L) // CMS never under-counts the full history
    intercept[IllegalArgumentException] {
      SketchMaintain.heavyHitters(spark, dirS, 0)
    }
  }
}
