package graft.tools

import graft._
import graft.functions.{Dedup, IvfIndex, Similarity, TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Round-4 hotspot breakdown: p6 / p7 / p12 / p19 stage timings + row
  * counts (dev diagnostics only). */
object ProfileR4 {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)
    def time[A](tag: String)(f: => A): A = DevTool.time("prof", tag)(f)
    // warm-up (JIT + codegen caches) on a small slice of the target dir
    docs.count(); embs.count()
    Dedup.ngramJaccardPairs(docs.limit(200), 800).count()

    // ---- p6 ----
    val shArr = Dedup.shingleArrays(docs)
    time("p6 shingle arrays")(println(s"[prof]   rows=${shArr.count()}"))
    time("p6 exploded shingles")(println(s"[prof]   rows=${shArr.select(col("sid"), explode(col("shs")).as("sh")).count()}"))
    val sh = shArr.select(col("sid"), explode(col("shs")).as("sh")).hint("merge")
    val a = sh.select(col("sid").as("doc_a"), col("sh"))
    val b = sh.select(col("sid").as("doc_b"), col("sh"))
    val joined = a.join(b, Seq("sh")).where(col("doc_a") < col("doc_b"))
    time("p6 join pairs (pre-group)")(println(s"[prof]   rows=${joined.count()}"))
    val inter = joined.groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    time("p6 inter groupBy")(println(s"[prof]   rows=${inter.count()}"))
    time("p6 full")(Dedup.ngramJaccardPairs(docs, 800).write.format("noop").mode("overwrite").save())

    // ---- p7 ----
    val sigRows = Dedup.minhashSignatureRows(shArr, 8)
    time("p7 signature rows")(println(s"[prof]   rows=${sigRows.count()}"))
    val cands = Dedup.lshCandidatePairs(sigRows)
    time("p7 candidates")(println(s"[prof]   rows=${cands.count()}"))
    time("p7 full")(Dedup.minhashLsh(docs, 8, 800).write.format("noop").mode("overwrite").save())

    // ---- p12 ----
    val model = time("p12 train")(IvfIndex.train(embs, k = 16, iters = 3))
    time("p12 knn")(IvfIndex.knn(embs, model, col("vec_id") < 20, 3, nprobe = 4)
      .write.format("noop").mode("overwrite").save())

    // ---- p19 ----
    val shB = Dedup.shingleArrays(docs).withColumn("bucket", TF.splitBucket(col("sid")))
    val train = shB.where(col("bucket") < 90).select(col("sid").as("train_id"), explode(col("shs")).as("sh"))
    val test = shB.where(col("bucket") >= 95).select(col("sid").as("test_id"), explode(col("shs")).as("sh"))
    time("p19 join")(println(s"[prof]   rows=${train.join(test, Seq("sh")).count()}"))
    time("p19 full")(SparkEntry.queries("p19_contamination")(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
