package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers for shuffle-free co-located joins — the storage
  * layout a 100 TB pipeline uses for its recurring heavy equi-joins
  * (events ⋈ users every day): pay the partitioning shuffle ONCE at write
  * time (`bucketBy` + `sortBy`), and every subsequent join or aggregation
  * on the bucket key plans with zero Exchange on that side — the scan
  * itself reports the hash-partitioned, sorted distribution. The batch
  * analog of the reference's one-time `server.id`-keyed capture layout.
  *
  * Plan contract (asserted in BucketedJoinSpec): joining two tables
  * bucketed (same count) on their join keys yields a SortMergeJoin with
  * NO `Exchange hashpartitioning` under it.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. `buckets`
    * should divide the target parallelism; both sides of a co-located
    * join must use the SAME count (Spark only elides the shuffle when
    * the output partitioning matches). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)
}
