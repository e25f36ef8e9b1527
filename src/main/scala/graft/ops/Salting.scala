package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * AQE's skew-join splitting handles most hot keys at runtime; these
  * utilities are the explicit form for the cases AQE can't re-plan —
  * a single monster key inside a hash aggregate, or a broadcast-able
  * small side that must meet every salted replica.
  */
object Salting {

  /** Two-phase salted aggregation: pre-aggregate on (key, salt) —
    * spreading one hot key over `salts` reducers — then combine.
    * Salt is derived from stable row content (deterministic, no
    * rand()). */
  def saltedCount(df: DataFrame, keyCol: String, saltFrom: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted join: the big (skewed) side gets a content-derived salt,
    * the small side is replicated once per salt value, and the join
    * key becomes (key, salt) — a hot key now lands on `salts`
    * reducers instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, salts: Int): DataFrame = {
    val b = big.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
