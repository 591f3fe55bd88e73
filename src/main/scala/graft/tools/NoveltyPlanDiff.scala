package graft.tools

import graft.functions.{TextFunctions => TF}

/** Dev diagnostic (r14 verdict item 1): is the lazy
  * `bigramSets ∘ ngramNoveltyOfSets` composition plan-identical to the
  * inline [[TF.ngramNovelty]] under GraftSession's
  * InferFiltersFromGenerate exclusion? The r13 inline revert was measured
  * BEFORE the exclusion; this prints both executed plans (attribute ids
  * normalized) and whether either carries a kernel-bearing filter.
  * `runMain graft.tools.NoveltyPlanDiff [sfDir]` */
object NoveltyPlanDiff {
  private def normalize(p: String): String =
    p.replaceAll("#\\d+L?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[file:[^\\]]*\\]", "[file:x]")

  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val inline = TF.ngramNovelty(docs).queryExecution.executedPlan.toString
    val lazyComp = TF.ngramNoveltyOfSets(TF.bigramSets(docs))
      .queryExecution.executedPlan.toString
    val (ni, nl) = (normalize(inline), normalize(lazyComp))
    println(s"[noveltydiff] identical=${ni == nl}")
    println(s"[noveltydiff] inline kernel-filter hits: ${KernelAudit.hits(inline).size}")
    println(s"[noveltydiff] lazy   kernel-filter hits: ${KernelAudit.hits(lazyComp).size}")
    if (ni != nl) {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/novelty_inline.txt"),
        ni.getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/novelty_lazy.txt"),
        nl.getBytes("UTF-8"))
      println("[noveltydiff] wrote /tmp/novelty_inline.txt /tmp/novelty_lazy.txt")
    }
    spark.stop()
  }
}
