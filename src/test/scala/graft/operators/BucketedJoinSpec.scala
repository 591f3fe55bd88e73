package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The bucketing plan contract: equal-bucket tables joined on their
  * bucket keys must plan ZERO hash exchanges — the pay-the-shuffle-once
  * layout for recurring heavy joins at scale. */
class BucketedJoinSpec extends SparkSpec {

  test("co-located join of two bucketed tables plans no hash exchange") {
    val e = Tables.events(spark, sf()).select("event_id", "user_id", "value")
    val c = Tables.customer(spark, sf()).select("c_custkey", "c_name")
    try {
      // writes inside the try: a failing second write must still clean up
      Bucketing.writeBucketed(e, "ev_bucketed", "user_id", 4)
      Bucketing.writeBucketed(c, "cust_bucketed", "c_custkey", 4)
      // force the sort-merge path: a broadcast would also be exchange-free
      // but would prove nothing about the bucketed distribution
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("ev_bucketed")
        .join(spark.table("cust_bucketed"), col("user_id") === col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$p")
      // and the result is ROW-identical to the unbucketed join (count
      // equality alone would miss drop+duplicate compensations)
      val unbucketed = e.join(c, col("user_id") === col("c_custkey"))
      assert(j.exceptAll(unbucketed).isEmpty && unbucketed.exceptAll(j).isEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS cust_bucketed")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val e = Tables.events(spark, sf()).select("event_id", "user_id", "value")
    Bucketing.writeBucketed(e, "ev_bucketed_agg", "user_id", 4)
    try {
      val a = spark.table("ev_bucketed_agg")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val p = a.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed groupBy must not shuffle:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS ev_bucketed_agg")
  }
}
