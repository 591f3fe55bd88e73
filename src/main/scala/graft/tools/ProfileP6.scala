package graft.tools

import graft._
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

object ProfileP6 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir).cache()
    docs.count()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val norm = TextFunctions.normText(col("text"))
    time("norm only")(docs.select(length(norm).as("n")).agg(sum("n")).collect())
    val ws = TextFunctions.words(norm)
    time("words size")(docs.select(size(ws).as("n")).agg(sum("n")).collect())
    val grams = transform(sequence(lit(1), size(ws) - 2), i =>
      concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))
    time("trigrams size")(docs.select(size(grams).as("n")).agg(sum("n")).collect())
    time("trigrams distinct size")(docs.select(size(array_distinct(grams)).as("n")).agg(sum("n")).collect())
    time("full shingles explode")(docs.select(explode(TextFunctions.trigramShingles(ws))).count())
    // alternative: split once via withColumn, then slice-based trigrams
    val d2 = docs.withColumn("ws", ws)
    val grams2 = transform(sequence(lit(1), size(col("ws")) - 2), i =>
      concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))
    time("materialized-ws trigrams")(d2.select(size(array_distinct(grams2)).as("n")).agg(sum("n")).collect())
    spark.stop()
  }
}
