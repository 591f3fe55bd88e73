package graft.functions

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared lineage-truncation device for ITERATIVE DataFrame loops
  * (connected components in [[Dedup]], the BPE merge loop in
  * [[TextFunctions.bpeTrain]]): `localCheckpoint` a frame eagerly and
  * hand back the persisted RDDs that now back it, so the caller can
  * free each round's blocks DETERMINISTICALLY once the next round has
  * materialized — `Dataset.unpersist` only talks to the CacheManager,
  * which knows nothing about checkpoint blocks, so without the handle
  * every iteration would leak one state table for the life of the
  * session. Truncating lineage each round is what keeps round i from
  * recomputing rounds 1..i−1 (the quadratic-recompute trap of naive
  * iterative DataFrames) and keeps the analyzer's per-round plan cost
  * O(1) instead of O(i). */
private[graft] object CheckpointUtil {

  /** Checkpoint `df` eagerly; returns the checkpointed frame plus the
    * storage-bearing RDDs backing it, found by walking the physical
    * plan's RDD dependency graph from `queryExecution.toRdd` down to
    * the first persisted ancestors (the walk stops at them, so
    * unrelated persisted RDDs deeper in a lineage are never touched). */
  def trackedLocalCheckpoint(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val cp = df.localCheckpoint()
    val out = scala.collection.mutable.Buffer[RDD[_]]()
    def walk(r: RDD[_]): Unit =
      if (r.getStorageLevel != StorageLevel.NONE) out += r
      else r.dependencies.foreach(d => walk(d.rdd))
    walk(cp.queryExecution.toRdd)
    (cp, out.toSeq)
  }

  /** Session-wide ledger for checkpoint blocks that back a RETURNED
    * frame (freeing them inside the producing call would make the
    * result unrecomputable — lineage is truncated). Registered blocks
    * are drained by [[releaseRegistered]], which
    * [[Dedup.releaseCcLabels]] calls — the hook the bench/smoke
    * harnesses (and long-lived ingest sessions) already invoke between
    * queries/passes. The CC label ledger in [[Dedup]] predates this one
    * and keeps its own buffer; both drain through the same call. */
  private val ledger = scala.collection.mutable.Buffer[RDD[_]]()

  def register(blocks: Seq[RDD[_]]): Unit =
    ledger.synchronized { ledger ++= blocks }

  def releaseRegistered(): Unit = ledger.synchronized {
    ledger.foreach(_.unpersist(blocking = false))
    ledger.clear()
  }
}
