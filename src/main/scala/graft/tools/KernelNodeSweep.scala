package graft.tools

/** Dev probe (r14): the committed KernelAudit guards Filter/DataFilters —
  * this sweep asks whether any OTHER per-row evaluation site in the 92
  * executed plans carries a kernel expression inline: join conditions,
  * exchange hashpartitioning keys, sort orders, window partition specs,
  * aggregate grouping keys. Result on the r14 tree: exactly two hits,
  * both the cosine pair-scoring predicate `vec_dot(a,b) >= threshold`
  * inside the join condition of p13 (exact all-pairs anchor) and p49
  * (within-cell verify) — the operator's own per-pair work, evaluated
  * where it must be, adjudicated benign; zero kernels in any
  * exchange/sort/window/aggregate key. KernelAuditSpec pins both facts.
  * `runMain graft.tools.KernelNodeSweep [sfDir]` */
object KernelNodeSweep {
  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan =
        try q(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Exception => s"<failed: ${e.getMessage}>" }
      val hits = KernelAudit.nodeHits(plan)
      if (hits.nonEmpty) {
        flagged += 1
        println(s"[nodesweep] $name: ${hits.map(h => s"${h._1}<${h._2}>").distinct.mkString(",")}")
        hits.map(_._3).distinct.foreach(l => println("    " + l.take(240)))
      }
    }
    println(s"[nodesweep] flagged $flagged of ${graft.SparkEntry.queries.size} queries")
    spark.stop()
  }
}
