package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join (skewed key)") {
    // 90% of events on one hot user + a long tail
    val big = (1 to 2000).map(i => (if (i % 10 != 0) 7L else i.toLong % 50, s"e$i"))
      .toDF("user_id", "payload")
    val dim = (0L to 49L).map(u => (u, s"name$u")).toDF("user_id", "name")
    val plain = big.join(dim, "user_id")
      .select("user_id", "payload", "name").as[(Long, String, String)].collect().sorted.toSeq
    val salted = SaltedJoin.inner(big, dim, "user_id", factor = 8)
      .select("user_id", "payload", "name").as[(Long, String, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("salted join on real tables matches q10 semantics") {
    val e = Tables.events(spark, sf()).filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
    val c = Tables.customer(spark, sf()).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "user_id")
    val plain = e.join(c, "user_id").count()
    val salted = SaltedJoin.inner(e, c, "user_id", factor = 4).count()
    assert(salted === plain && plain > 0)
  }
}
