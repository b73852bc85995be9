package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.crawl.ReportActions
import graft.operators.Similarity

/** Property checks for the two trickiest round-4 primitives:
  * the shortest-round-trip float layout and the codegen float dot. */
class ReprPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

  test("pyFloatRepr: round-trips exactly and is never longer than Java's digits") {
    // mix magnitudes: uniform bits (covers subnormals/extremes) + everyday values
    val bitsGen = Gen.choose(Long.MinValue, Long.MaxValue)
      .map(java.lang.Double.longBitsToDouble)
    val plainGen = Gen.choose(-1e9, 1e9)
    val doubles = (sample(bitsGen, 3000) ++ sample(plainGen, 2000))
      .filter(d => !d.isNaN && !d.isInfinite)
    doubles.foreach { d =>
      val r = ReportActions.pyRepr(d)
      // exact round-trip: Python's repr contract
      val back = java.lang.Double.parseDouble(
        r.replace("e+", "E").replace("e-", "E-"))
      assert(back == d || (back == 0.0 && d == 0.0),
        s"round-trip broke: $d -> $r -> $back")
      // shortest: no more SIGNIFICANT digits than Java's own form
      // (layout zeros — "0.000x", trailing ".0" — don't count)
      def sigDigits(s: String): Int = s
        .takeWhile(c => c != 'e' && c != 'E')
        .filter(_.isDigit)
        .dropWhile(_ == '0').reverse.dropWhile(_ == '0')
        .length
      assert(sigDigits(r.stripPrefix("-")) <=
        math.max(1, sigDigits(java.lang.Double.toString(math.abs(d)))),
        s"$d: $r has more digits than ${java.lang.Double.toString(d)}")
    }
  }

  test("FloatDotExpr ≡ plain Scala loop on random vectors (exact doubles)") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16,
      Gen.choose(-8f, 8f)).map(_.toArray)
    val pairs = sample(Gen.zip(vecGen, vecGen), 200).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.toSeq, b.toSeq) }
    val df = pairs.toDF("id", "a", "b")
    val got = df.select(col("id"),
        Similarity.dotFloat(col("a"), col("b")).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.foreach { case (id, a, b) =>
      var want = 0.0d
      var i = 0
      while (i < a.length) { want += (a(i) * b(i)).toDouble; i += 1 }
      assert(got(id) == want, s"pair $id: ${got(id)} != $want")
    }
    // mismatched lengths yield NULL, like the zip_with fold it replaced
    val bad = Seq((1L, Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("id", "a", "b")
      .select(Similarity.dotFloat(col("a"), col("b")).as("dot"))
      .collect().head
    assert(bad.isNullAt(0), "length mismatch must be NULL, not a partial dot")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
