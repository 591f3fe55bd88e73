package graft.tools

import graft._
import graft.functions.Dedup
import org.apache.spark.sql.functions._

object ProfileP7 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = Dedup.shingles(docs).cache()
    time("shingles")(sh.count())
    val sig = Dedup.minhashSignatures(sh, 8).cache()
    time("signatures")(println(s"[prof] sig rows: ${sig.count()}"))
    val cands = Dedup.lshCandidates(sig)
    time("candidates")(println(s"[prof] cand pairs: ${cands.count()}"))
    time("full p7 (fresh)")(Dedup.minhashLsh(docs, 8, 800).count())
    time("full p7 again")(Dedup.minhashLsh(docs, 8, 800).count())
    spark.stop()
  }
}
