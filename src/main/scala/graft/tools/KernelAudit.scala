package graft.tools

/** Sweep every contract query's executed plan for expensive kernel
  * expressions evaluated inside Filter nodes or scan DataFilters — the
  * general form of the InferFiltersFromGenerate + pushdown-substitution
  * trap (any rule that clones a predicate through a projection
  * re-evaluates the projected kernel per conjunct).
  *
  * The matcher lives here so the dev tool and the spec-level guard
  * (KernelAuditSpec) share one implementation: the r13 version's
  * `trim.startsWith("Filter")` never matched a real executed-plan line
  * (tree connectors `+- ` / `:- ` and the codegen `*(n) ` prefix precede
  * the node name), so the Filter branch was dead — KernelAuditSpec keeps
  * a positive control so the matcher can't silently go dead again.
  *
  * `runMain graft.tools.KernelAudit [sfDir]` */
object KernelAudit {
  val Kernels = Seq(
    "trigram_shingles", "minhash_bands", "minhash_components",
    "anchor_window_hashes", "anchor_window_pos_hashes", "word_term_counts",
    "word_stats", "regexp_replace", "vec_dot", "nearest_cell",
    "bloom_contains")

  // a plan line's node name follows optional tree art (spaces, `:`,
  // `+-`) and an optional whole-stage-codegen `*(n) ` prefix
  private val FilterNode = """^[\s:+-]*(\*\(\d+\) )?Filter\b""".r

  /** The `[...]` payload of `DataFilters: [...]` on a scan line, or ""
    * — kernels elsewhere on a FileScan line (ReadSchema, PushedFilters,
    * Location) are not evaluated filters and must not flag. */
  private[tools] def dataFiltersSegment(line: String): String = {
    val marker = "DataFilters: ["
    val start = line.indexOf(marker)
    if (start < 0) ""
    else {
      val rest = line.substring(start + marker.length)
      // the list is followed by `], Format:`; fall back to the last `]`
      // for truncated/other renderings
      val end = rest.indexOf("], Format:") match {
        case -1 => rest.lastIndexOf(']')
        case i => i
      }
      if (end < 0) rest else rest.substring(0, end)
    }
  }

  // non-Filter per-node sweep targets: a kernel inline in a join
  // condition is evaluated per candidate pair; one in an exchange/sort/
  // window/aggregate key would mean the operator keys on a raw kernel
  // expression instead of its projected attribute
  private val NodeRe =
    ("""^[\s:+-]*(\*\(\d+\) )?(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|""" +
      """BroadcastNestedLoopJoin|CartesianProduct|Exchange|Sort|Window|""" +
      """HashAggregate|ObjectHashAggregate|SortAggregate|TakeOrderedAndProject)\b""").r

  /** (node name, kernel, line text) for every join/exchange/sort/window/
    * aggregate plan line that carries a kernel expression inline. Unlike
    * [[hits]] these are not automatically traps — a similarity predicate
    * in a join condition IS the operator's per-pair work — so the
    * spec-level guard allowlists the adjudicated shapes. */
  def nodeHits(plan: String, kernels: Seq[String] = Kernels): Seq[(String, String, String)] =
    plan.linesIterator.flatMap { l =>
      NodeRe.findFirstMatchIn(l).toSeq.flatMap { m =>
        kernels.filter(l.contains).map(k => (m.group(2), k, l.trim))
      }
    }.toSeq

  /** (line index, kernel, line text) for every plan line that evaluates
    * a kernel inside a Filter node or a scan's DataFilters. */
  def hits(plan: String, kernels: Seq[String] = Kernels): Seq[(Int, String, String)] =
    plan.linesIterator.zipWithIndex.flatMap { case (l, i) =>
      val searchable =
        if (FilterNode.findFirstIn(l).isDefined) l.trim
        else dataFiltersSegment(l)
      if (searchable.isEmpty) Nil
      else kernels.filter(searchable.contains).map(k => (i, k, l.trim))
    }.toSeq

  def main(args: Array[String]): Unit = {
    val spark = DevTool.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan =
        try q(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Exception => s"<failed: ${e.getMessage}>" }
      val found = hits(plan)
      if (found.nonEmpty) {
        flagged += 1
        println(s"[audit] $name: ${found.map(_._2).distinct.mkString(",")}")
        found.map(h => (h._1, h._3)).distinct.foreach { case (_, line) =>
          println("    " + line.take(240))
        }
      }
    }
    println(s"[audit] flagged $flagged of ${graft.SparkEntry.queries.size} queries")
    spark.stop()
  }
}
