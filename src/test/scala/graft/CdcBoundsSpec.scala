package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.functions.CdcBoundsExpr]] (one-pass native boundary
  * scan, r17) value-identical to the legacy per-position spelling
  * `explode(sequence(1, len-3))` +
  * `md5Long(substr(text, i, 4)) % 64 = 0` that
  * [[graft.operators.CorpusOps.qContentChunks]] declared through r16 —
  * including code-point (not byte) window stepping on multibyte text.
  */
class CdcBoundsSpec extends SparkSpec {

  import spark.implicits._

  private def legacyEnds(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    .filter(col("len") >= 4)
    .select(col("doc_id"), col("text"),
      explode(sequence(lit(1), col("len") - 3)).as("i"))
    .filter(graft.functions.Exprs.md5Long(
      col("text").substr(col("i"), lit(4))) % 64 === 0)
    .select(col("doc_id"), (col("i") + 3).as("e"))

  private def fastEnds(df: org.apache.spark.sql.DataFrame) = df
    .filter(length(col("text")) >= 4)
    .select(col("doc_id"),
      explode(graft.functions.Exprs.cdcBounds(col("text"))).as("e"))

  test("native boundary scan equals the per-position md5 probe") {
    // deterministic pseudo-docs: repeated word soup gives plenty of
    // mod-64 hits; include short docs, exact-4, and empty-ish edges
    val docs = (0 until 200).map { i =>
      val words = (0 until (i % 37) + 1).map(j => s"w${(i * 31 + j * 7) % 53}")
      (i.toLong, words.mkString(" "))
    } ++ Seq((900L, ""), (901L, "abc"), (902L, "abcd"), (903L, "    "),
      (904L, "a b"), (905L, "xyzw" * 50))
    val df = docs.toDF("doc_id", "text")
    val legacy = legacyEnds(df).collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val fast = fastEnds(df).collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(fast.toSeq === legacy.toSeq)
    assert(legacy.nonEmpty) // the fixture actually exercises boundaries
  }

  test("multibyte text steps by code points, not bytes") {
    val df = Seq(
      (1L, "élève naïve café crème brûlée œuvre"),
      (2L, "漢字テスト の ドキュメント 内容 です よ ね"),
      (3L, "mixed ascii と 日本語 and émojis 😀😀 tail words here"),
      (4L, "éé漢😀"), // exactly 4 code points, 1+1+1+2... varied widths
      (5L, ("ド" * 30) + " " + ("é" * 17))).toDF("doc_id", "text")
    val legacy = legacyEnds(df).collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val fast = fastEnds(df).collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(fast.toSeq === legacy.toSeq)
  }

  test("ascending, null-safe, and empty below the window") {
    val arr = Seq((1L, Option("zz"))).toDF("doc_id", "text")
      .select(graft.functions.Exprs.cdcBounds(col("text")).as("b")).head()
    assert(arr.getSeq[Int](0).isEmpty)
    val nul = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(graft.functions.Exprs.cdcBounds(col("text")).as("b")).head()
    assert(nul.isNullAt(0))
    val asc = Seq((1L, ("word soup " * 200).trim)).toDF("doc_id", "text")
      .select(graft.functions.Exprs.cdcBounds(col("text")).as("b")).head()
      .getSeq[Int](0)
    assert(asc === asc.sorted)
  }
}
