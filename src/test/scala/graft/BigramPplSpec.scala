package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Hand-computed add-one bigram surprisal on a 3-doc fixture. */
class BigramPplSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("bigram").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bigram surprisal: exact milli-bit terms, add-one smoothing, <2-word docs drop") {
    // corpus: c(a)=4 c(b)=2 c(c)=1, V=3; bigrams (a,b):2 (b,a):1 (a,a):1
    // s(a,b) = floor(1000*log2((4+3)/(2+1))) = 1222
    // s(b,a) = floor(1000*log2((2+3)/(1+1))) = 1321
    // s(a,a) = floor(1000*log2((4+3)/(1+1))) = 1807
    val dir = writeDocs((1L, "a b a b"), (2L, "a a"), (3L, "c"))
    val r = CorpusOps.qBigramPpl(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    // d1: pairs (a,b),(b,a),(a,b) → 1222+1321+1222 = 3765, bpt 1255
    assert(r(1L) === ((3L, 3765L, 1255L)))
    // d2: one (a,a) pair
    assert(r(2L) === ((1L, 1807L, 1807L)))
    // d3: single word — no bigrams, absent
    assert(!r.contains(3L))
  }

  test("repetitive transitions score low, novel transitions high") {
    // doc 10 repeats one common transition; doc 11 is all one-off pairs
    val dir = writeDocs(
      (10L, "x y x y x y x y x y"),
      (11L, "p q r s t u v w"))
    val r = CorpusOps.qBigramPpl(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(10L) < r(11L), r)
  }
}
