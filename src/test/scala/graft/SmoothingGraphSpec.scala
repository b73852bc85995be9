package graft

import org.apache.spark.sql.functions._

/** Hand-traced fixtures for the r15 final pair: Good-Turing
  * count-of-counts re-estimation and the Borůvka selection round
  * over the minhash candidate graph. */
class SmoothingGraphSpec extends SparkSpec {

  private def tmpDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("smooth-spec").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "src", t.length.toLong, "en") }
      .toDF("doc_id", "text", "source", "n_chars", "lang")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("good-turing: hand-traced count-of-counts and adjusted counts") {
    // corpus words: a a b b c  ->  freq a=2, b=2, c=1
    // coc: N_1 = 1 (c), N_2 = 2 (a, b)
    // r=1: r* = (1+1) * N_2 * 1000 / N_1 = 2*2*1000/1 = 4000 milli
    // r=2: N_3 = 0 -> r* = 0 (the raw-GT gap, reported)
    val dir = tmpDocs(Seq("a a b", "b c"))
    val rows = operators.CorpusOps.qGoodTuring(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((1L, 1L, 2L, 4000L), (2L, 2L, 0L, 0L)))
  }

  test("boruvka step: mutual best edge on a planted near-dup pair, isolate absent") {
    // docs 0 and 1 near-identical -> banded-LSH candidates; doc 2 disjoint
    val dir = tmpDocs(Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and again!",
      "an entirely different document about distributed query engines"))
    val out = operators.Dedup.qBoruvkaStep(spark, dir).collect()
    val byDoc = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byDoc.keySet === Set(0L, 1L), "only candidate-graph vertices emit")
    assert(byDoc(0L)._1 === 1L && byDoc(1L)._1 === 0L,
      "a single shared edge must be mutually chosen")
    assert(byDoc(0L)._2 === byDoc(1L)._2, "both directions carry the edge weight")
    val w = byDoc(0L)._2
    assert(w % 125L === 0L && w >= 0L && w <= 1000L,
      s"weight is 125 permille per agreeing signature component, got $w")
    assert(w >= 500L, s"near-identical docs should agree on most components, got $w")
  }
}
