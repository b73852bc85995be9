package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOf

/** Property check for the merge-form as-of join: on random key/time
  * sets (dense timestamp collisions included), the distributed plan
  * agrees exactly with an O(n·m) reference computed in plain Scala —
  * per left row the right row with max time ≤ left time, nulls when
  * none exists. */
class AsOfPropertySpec extends SparkSpec {

  test("asofJoin ≡ brute-force latest-at-or-before on random data") {
    import spark.implicits._
    def sample[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

    // few keys + tiny time domain → lots of equal-time ties
    val keyGen = Gen.choose(1L, 5L)
    val timeGen = Gen.choose(0L, 30L)
    val leftRows = sample(Gen.zip(keyGen, timeGen), 300)
      .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
    // right side must be unique per (key, time) — the operator contract
    val rightRows = sample(Gen.zip(keyGen, timeGen), 200).distinct
      .zipWithIndex.map { case ((k, t), i) => (k, t, 2000L + i) }

    val left = leftRows.toDF("k", "t", "left_id")
    val right = rightRows.toDF("k", "t", "right_id")
    val got = AsOf.asofJoin(left, right, "k", "t", Seq("right_id"))
      .collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap

    val byKey = rightRows.groupBy(_._1)
    val want = leftRows.map { case (k, t, id) =>
      val best = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t)
        .sortBy(r => (r._2, r._3))
        .lastOption // max time; unique per (k,t) so no further ties
      id -> best.map(_._3)
    }.toMap

    assert(got.size == leftRows.size, "as-of join must preserve every left row")
    assert(got == want)
  }
}
