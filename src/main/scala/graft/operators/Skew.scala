package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); these are the explicit
  * forms for when the skew is known ahead of time (a hot key like a
  * single giant directory owner, an empty-string token, a null-ish
  * sentinel).
  */
object Skew {

  /** Two-phase salted aggregation: spread a hot group key over
    * `buckets` salt partitions, partially aggregate, then merge.
    * Works for any algebraic aggregate expressed as (partial, merge)
    * column pairs over the SAME output names. */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      buckets: Int): DataFrame = {
    val salted = df.select(
      key.as("k"),
      value.as("v"),
      (rand(seed = 7) * buckets).cast("int").as("salt"))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(sum(col("s")).as("sum_value"), sum(col("c")).as("n"))
  }

  /** Salted broadcast-replicated join for one known-hot build side:
    * replicate each small-side row `buckets` times with an explicit
    * salt, salt the big side uniformly, join on (key, salt). The big
    * side's hot key now lands on `buckets` reducers instead of one. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCol: String,
      buckets: Int): DataFrame = {
    // pmod, not abs(hash)%: abs(Int.MinValue) is still negative and a
    // negative salt would silently drop the row from the join
    val saltedBig = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, Seq(keyCol, "_salt")).drop("_salt")
  }
}
