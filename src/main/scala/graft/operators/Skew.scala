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

  /** Balanced candidate-pair generation for a self-join on a
    * potentially hot equality key (the LSH band-bucket problem: a
    * boilerplate-heavy corpus puts thousands of docs in ONE band
    * bucket, and a plain self-join computes that bucket's c² pairs on
    * a single reducer).
    *
    * Triangle replication: each row gets a deterministic salt
    * s = hash(id) mod g; the left side replicates to cells (s, j≥s),
    * the right side to cells (i≤s, s), and the join adds the cell to
    * the key — every unordered pair meets in EXACTLY one of the
    * g(g+1)/2 cells (the (min-salt, max-salt) cell), so a hot key's
    * quadratic work spreads over the cells at ~(c/g)² each instead of
    * c² on one reducer. Output: all (a < b) id pairs per key match,
    * each exactly once. Replication costs (g+1)/2 copies of each tiny
    * (key, id) row — the knob trades linear shuffle volume for
    * quadratic-reducer headroom. */
  def saltedSelfPairs(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      buckets: Int): DataFrame = {
    // pmod, not abs(hash)%: abs(Int.MinValue) is still negative and a
    // negative salt would silently drop rows
    val salted = df.withColumn("_salt",
      pmod(hash(col(idCol)), lit(buckets)).cast("int"))
    val a = salted
      .withColumn("_j", explode(sequence(col("_salt"), lit(buckets - 1))))
      .select(keyCols.map(k => col(k).as(s"_ka_$k")) ++
        Seq(col("_salt").as("_ia"), col("_j").as("_ja"), col(idCol).as("a")): _*)
    val b = salted
      .withColumn("_i", explode(sequence(lit(0), col("_salt"))))
      .select(keyCols.map(k => col(k).as(s"_kb_$k")) ++
        Seq(col("_i").as("_ib"), col("_salt").as("_jb"), col(idCol).as("b")): _*)
    // cell roles are ordered by SALT, not id: in an off-diagonal cell
    // (i<j) the left row is the salt-i doc whatever its id, so accept
    // either id order there and normalize below; the diagonal cell
    // (i=i) sees both orderings of a pair and keeps one via a<b
    val cond = keyCols.map(k => col(s"_ka_$k") === col(s"_kb_$k"))
      .reduce(_ && _) &&
      col("_ia") === col("_ib") && col("_ja") === col("_jb") &&
      (col("_ia") < col("_ja") || col("a") < col("b"))
    a.join(b, cond)
      .select(least(col("a"), col("b")).as("a"),
              greatest(col("a"), col("b")).as("b"))
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
