package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual escape hatch when AQE's
  * skew-join split (sort-merge only) doesn't apply or a hot key is known
  * upfront (e.g. a null-ish default user_id receiving most CDC events).
  *
  * The big side gets a deterministic per-row salt in [0, factor); the
  * small side is replicated `factor` times via explode. The join key
  * becomes (key, salt), so one hot key spreads over `factor` reducers.
  * Result is row-identical to the unsalted join (inner/left semantics
  * preserved; the salt columns never escape).
  */
object SaltedJoin {

  /** Inner-join `big ⋈ small` on `key`, spreading each big-side key over
    * `factor` partitions. Deterministic salt: hash of the whole big row. */
  def inner(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val bigS = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(factor)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
