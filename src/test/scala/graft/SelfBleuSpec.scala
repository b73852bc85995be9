package graft

import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** Pins [[TextStats.qSelfBleu]]'s clip rule on planted panels (the sf
  * replay proves oracle agreement; these prove the BLEU clip — "count
  * only up to the max in any OTHER document" — is the intended one). */
class SelfBleuSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("sbleu").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("identical documents score 1000; a unique document scores 0") {
    val dir = writeDocs(
      (0L, "a b c d"), // bigrams ab,bc,cd — duplicated by doc 1
      (1L, "a b c d"),
      (2L, "x y z w")) // bigrams xy,yz,zw — nowhere else
    val got = panelRows(dir)
    assert(got(0L) === ((3L, 3L, 1000L)))
    assert(got(1L) === ((3L, 3L, 1000L)))
    assert(got(2L) === ((3L, 0L, 0L)))
    // corpus micro-average: 6 clipped of 9
    assert(TextStats.qSelfBleu(spark, dir).collect()
      .forall(_.getAs[Long]("corpus_permille") === 666L))
  }

  test("clip: a unique-max count collapses to the runner-up, not itself") {
    // doc 0 repeats "a b" 3x; doc 1 has it once -> doc 0 clips to 1,
    // doc 1 keeps its 1 (doc 0's count is the max-other for doc 1)
    val dir = writeDocs(
      (0L, "a b a b a b"), // bigrams: ab x3, ba x2
      (1L, "a b q"))       // bigrams: ab x1, bq x1
    val got = panelRows(dir)
    // doc 0: ab clip min(3, other-max 1) = 1; ba clip min(2, 0) = 0
    assert(got(0L) === ((5L, 1L, 200L)))
    // doc 1: ab clip min(1, 3) = 1; bq clip 0
    assert(got(1L) === ((2L, 1L, 500L)))
  }

  test("panel bound: doc_id >= 64 never enters the panel") {
    val dir = writeDocs(
      (0L, "a b"), (63L, "a b"), (64L, "a b"), (1000L, "a b"))
    val got = panelRows(dir)
    assert(got.keySet === Set(0L, 63L))
  }

  private def panelRows(dir: String): Map[Long, (Long, Long, Long)] =
    TextStats.qSelfBleu(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_clipped"),
          r.getAs[Long]("bleu2_permille")))).toMap
}
