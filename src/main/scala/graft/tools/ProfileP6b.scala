package graft.tools

import graft._
import graft.functions.Dedup
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the restructured p6/p7 (dev diagnostics). */
object ProfileP6b {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val shArr = Dedup.shingleArrays(docs)
    time("shingleArrays size-sum")(shArr.select(size(col("shs")).as("n")).agg(sum("n")).collect())
    val sh = shArr.select(col("sid"), explode(col("shs")).as("sh"))
    time("explode count")(println("rows=" + sh.count()))
    val a = sh.hint("merge").select(col("sid").as("doc_a"), col("sh"))
    val b = sh.hint("merge").select(col("sid").as("doc_b"), col("sh"))
    val joined = a.join(b, Seq("sh")).where(col("doc_a") < col("doc_b"))
    time("self-join count")(println("pairs=" + joined.count()))
    val inter = joined.groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    time("inter agg count")(println("inter=" + inter.count()))
    val sig = Dedup.minhashSignatureRows(shArr, 8)
    time("signature rows")(println("sig=" + sig.count()))
    val cands = Dedup.lshCandidates(sig)
    time("lsh candidates")(println("cands=" + cands.count()))
    time("full p6")(Dedup.ngramJaccardPairs(docs, 800).write.format("noop").mode("overwrite").save())
    time("full p7")(Dedup.minhashLsh(docs, 8, 800).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
