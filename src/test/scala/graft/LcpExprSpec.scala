package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** [[graft.functions.LcpExpr]]: the codegen LCP probe ≡ the pure-SQL
  * HOF spelling it replaced, on generated and adversarial inputs,
  * through BOTH the registry (SQL `lcp(...)`) and the bridge-Column
  * path the operator uses. */
class LcpExprSpec extends SparkSpec {

  import spark.implicits._

  private def register(): Unit = {
    val reg = spark.sessionState.functionRegistry
    val (ident, info, builder) = GraftExtensions.lcpDescriptor
    if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
  }

  /** The HOF expression q_sorted_neighbors shipped with before the
    * native expression existed — with the empty-input guard the
    * original lacked: `sequence(1, 0)` is DESCENDING `[1, 0]` in
    * Spark, so the unguarded spelling returns 1 for two empty strings
    * (substring('', 1, 1) = '' matches itself at the phantom step).
    * The operator never hit this (it filters length ≥ 8); the native
    * expression returns the correct 0 — one more reason it replaced
    * the HOF. */
  private val hofLcp =
    """CAST(CASE WHEN least(length(a), length(b)) < 1 THEN 0 ELSE
      |  aggregate(
      |    sequence(1, least(least(length(a), length(b)), 64)),
      |    0,
      |    (acc, i) -> IF(acc = i - 1
      |                   AND substring(a, i, 1) = substring(b, i, 1),
      |                   i, acc)) END AS BIGINT)""".stripMargin

  test("native lcp ≡ HOF spelling on generated pairs; cap and edges hold") {
    register()
    val word = Gen.listOf(Gen.oneOf('a', 'b', ' ')).map(_.mkString)
    val pairs = (1 to 300).flatMap { _ =>
      for (a <- word.sample; b <- word.sample) yield (a, b)
    } ++ Seq(
      ("", ""), ("", "x"), ("same", "same"),
      ("a" * 100, "a" * 100),           // cap clamps at 64
      ("a" * 63 + "b", "a" * 63 + "c"), // diverges exactly at the cap
      ("préfix", "préfixe"),            // BMP multibyte prefix
      ("𐐀x", "𐐀y"), // astral shared prefix (1 cp)
      ("𐐀", "𐐁"))   // astral codepoints differing
                                          // only in the low surrogate:
                                          // code-POINT lcp = 0, like the
                                          // substr probes on both engines
    val df = pairs.toDF("a", "b")
    val r = df.selectExpr("a", "b", "lcp(a, b, 64) AS native",
        s"$hofLcp AS hof").collect()
    r.foreach { row =>
      assert(row.getLong(2) === row.getLong(3),
        s"lcp mismatch for '${row.getString(0)}'/'${row.getString(1)}'")
    }
    val byPair = r.map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(byPair(("a" * 100, "a" * 100)) === 64L)
    assert(byPair(("a" * 63 + "b", "a" * 63 + "c")) === 63L)
    assert(byPair(("préfix", "préfixe")) === 6L)
    assert(byPair(("𐐀x", "𐐀y")) === 1L)
    assert(byPair(("𐐀", "𐐁")) === 0L)
    assert(byPair(("", "x")) === 0L)
  }

  test("null propagates; non-literal cap is rejected at registration") {
    register()
    val one = Seq(("abc", Option.empty[String])).toDF("a", "b")
    assert(one.selectExpr("lcp(a, b, 8)").collect().head.isNullAt(0))
    val dynamic = intercept[Exception] {
      Seq((1, "a", "b")).toDF("n", "a", "b").selectExpr("lcp(a, b, n)").collect()
    }
    assert(dynamic.getMessage.toLowerCase.contains("literal")
      || dynamic.getMessage.toLowerCase.contains("lcp"))
  }
}
