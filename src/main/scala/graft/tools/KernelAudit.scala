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
  /** Kernel names, DERIVED from the extension registry (r15): every
    * function [[graft.GraftExtensions]] registers is swept automatically,
    * so a future kernel cannot be forgotten here (the r14 manual-list
    * gap). The two extras are not registry names: `minhash_components`
    * is the md5-slice composite [[graft.functions.Dedup.mhComponentsCol]]
    * derives from minhash_bands, and `regexp_replace` is the one BUILTIN
    * expensive enough to treat as a kernel (the p17 quality gate). */
  val Kernels: Seq[String] =
    (graft.GraftExtensions.FunctionNames ++
      Seq("minhash_components", "regexp_replace")).distinct

  // a plan line's node name follows optional tree art (spaces, `:`,
  // `+-`) and an optional whole-stage-codegen `*(n) ` prefix
  private val FilterNode = """^[\s:+-]*(\*\(\d+\) )?Filter\b""".r

  /** Kernel INVOCATIONS in `text` — `name` followed by `(`. A bare
    * substring match would flag aliased output attributes (e.g. a
    * projection named `vec_dot_sim#12` in a node's output list), which
    * are references to an already-computed column, not evaluations. */
  private def invoked(text: String, kernels: Seq[String]): Seq[String] =
    kernels.filter(k => text.contains(k + "("))

  /** The payload of a `marker[...]` segment on a plan line, bracket-depth
    * balanced, or "" — kernels elsewhere on the line (ReadSchema,
    * PushedFilters, Location, output lists) are not evaluated there and
    * must not flag. Depth counting (not `lastIndexOf(']')`) so a
    * truncated or non-standard rendering can never absorb later
    * bracketed metadata into the segment. */
  private[tools] def bracketSegment(line: String, marker: String): String = {
    val start = line.indexOf(marker)
    if (start < 0) ""
    else {
      val rest = line.substring(start + marker.length)
      var depth = 1
      var i = 0
      while (i < rest.length && depth > 0) {
        rest.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1
          case _ => ()
        }
        i += 1
      }
      if (depth == 0) rest.substring(0, i - 1) else rest
    }
  }

  /** The `[...]` payload of `DataFilters: [...]` on a scan line, or "". */
  private[tools] def dataFiltersSegment(line: String): String =
    bracketSegment(line, "DataFilters: [")

  // non-Filter per-node sweep targets: a kernel inline in a join
  // condition is evaluated per candidate pair; one in an exchange/sort/
  // window/aggregate key would mean the operator keys on a raw kernel
  // expression instead of its projected attribute
  private val NodeRe =
    ("""^[\s:+-]*(\*\(\d+\) )?(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|""" +
      """BroadcastNestedLoopJoin|CartesianProduct|Exchange|Sort|Window|""" +
      """HashAggregate|ObjectHashAggregate|SortAggregate|TakeOrderedAndProject)\b""").r

  /** (node name, kernel, line text) for every join/exchange/sort/window/
    * aggregate plan line that carries a kernel INVOCATION inline. Unlike
    * [[hits]] these are not automatically traps — a similarity predicate
    * in a join condition IS the operator's per-pair work — so the
    * spec-level guard allowlists the adjudicated shapes.
    *
    * Aggregate nodes are scoped to their `keys=[...]` segment: an
    * AGGREGATE kernel (bin_count_agg, bloom_agg, vec_sum_fixed) inside
    * `functions=[...]` is the operator itself running where it belongs;
    * the trap class this sweep exists for is a kernel in a GROUPING key
    * (the exchange would re-evaluate it per row instead of hashing the
    * projected attribute). */
  def nodeHits(plan: String, kernels: Seq[String] = Kernels): Seq[(String, String, String)] =
    plan.linesIterator.flatMap { l =>
      NodeRe.findFirstMatchIn(l).toSeq.flatMap { m =>
        val node = m.group(2)
        val searchable =
          if (node.contains("Aggregate")) bracketSegment(l, "keys=[")
          else l
        invoked(searchable, kernels).map(k => (node, k, l.trim))
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
      else invoked(searchable, kernels).map(k => (i, k, l.trim))
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
