package graft.functions

import org.apache.spark.sql.SparkSession

/** Once-per-session stderr advisories for conf states that silently
  * degrade the engine's plans (the [[Dedup.minhashJaccardEstimate]]
  * AQE-off warning, generalized). Results stay correct either way —
  * these exist so a deployment that bypassed [[graft.GraftSession]]
  * finds out from its logs, not from a profile. */
object EngineWarnings {
  private val InferRule =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
  private val warned =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** True when the session EXPLICITLY opted out via the escape hatch
    * (`spark.graft.excludeInferFiltersFromGenerate=false`) — a deliberate,
    * documented choice that must not be nagged about. Lenient parse: a
    * malformed hatch value is not an explicit opt-out (GraftSession.create
    * rejects it loudly; a user-built session just gets the advisory). */
  private def hatchExplicitlyFalse(spark: SparkSession): Boolean =
    spark.conf.getOption(graft.GraftSession.ExcludeHatchKey)
      .exists(_.trim.equalsIgnoreCase("false"))

  /** Sessions built outside [[graft.GraftSession.create]] (user builder +
    * extensions conf) keep `InferFiltersFromGenerate` enabled, so every
    * explode over a projected kernel column re-evaluates the kernel
    * inside a synthesized pushdown filter (measured 1.7x on the
    * cross-corpus probe, the r13 plan-wide audit). Warn once per session
    * from the kernel chokepoints; GraftSession sessions never trigger
    * this (the rule is excluded there unless the escape hatch
    * `spark.graft.excludeInferFiltersFromGenerate=false` was chosen, an
    * explicit opt-out — which also suppresses this advisory). */
  def warnIfGenerateInferEnabled(spark: SparkSession, site: String): Unit =
    if (!spark.conf.get("spark.sql.optimizer.excludedRules", "").contains(InferRule)
        && !hatchExplicitlyFalse(spark)
        && warned.put(spark, java.lang.Boolean.TRUE) == null)
      System.err.println(s"[graft] $site: InferFiltersFromGenerate is " +
        "enabled in this session — explodes over projected kernel columns " +
        "will re-derive the kernel inside synthesized scan filters " +
        "(correct, ~1.7x slower on LSH shapes). Create the session via " +
        "graft.GraftSession, or exclude the rule: " +
        s"spark.conf.set(\"spark.sql.optimizer.excludedRules\", \"$InferRule\")")
}
