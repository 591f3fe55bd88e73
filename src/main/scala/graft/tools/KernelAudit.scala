package graft.tools

/** Dev diagnostic: sweep every contract query's executed plan for
  * expensive kernel expressions evaluated inside Filter nodes or scan
  * DataFilters — the general form of the InferFiltersFromGenerate +
  * pushdown-substitution trap (any rule that clones a predicate through
  * a projection re-evaluates the projected kernel per conjunct).
  * `runMain graft.tools.KernelAudit [sfDir]` */
object KernelAudit {
  private val Kernels = Seq(
    "trigram_shingles", "minhash_bands", "minhash_components",
    "anchor_window_hashes", "anchor_window_pos_hashes", "word_term_counts",
    "word_stats", "regexp_replace", "vec_dot", "nearest_cell",
    "bloom_contains")

  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan =
        try q(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Exception => s"<failed: ${e.getMessage}>" }
      val hits = plan.linesIterator.zipWithIndex.flatMap { case (l, i) =>
        val t = l.trim
        val inFilter = t.startsWith("Filter") ||
          (t.contains("FileScan") && t.contains("DataFilters: [") &&
            Kernels.exists(k => t.substring(t.indexOf("DataFilters: [")).contains(k)))
        if (inFilter) Kernels.filter(t.contains).map(k => (i, k)) else Nil
      }.toSeq
      if (hits.nonEmpty) {
        flagged += 1
        println(s"[audit] $name: ${hits.map(_._2).distinct.mkString(",")}")
        hits.map(_._1).distinct.foreach { i =>
          println("    " + plan.linesIterator.toSeq(i).trim.take(240))
        }
      }
    }
    println(s"[audit] flagged $flagged of ${graft.SparkEntry.queries.size} queries")
    spark.stop()
  }
}
