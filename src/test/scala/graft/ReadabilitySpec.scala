package graft

import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** [[TextStats.qFleschReading]] semantics on hand-counted fixtures (the
  * sf oracle gate covers testdata equivalence; this pins the formula
  * and its guards). */
class ReadabilitySpec extends SparkSpec {

  import spark.implicits._

  private def write(rows: (Long, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("flesch").toString
    rows.toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("flesch: hand-counted words/sentences/syllables give the exact milli score") {
    // "The cat sat. The dog ran!" → w=6 ([A-Za-z]+ runs), s=2 ([.!?]+
    // runs), syl=6 (one vowel run per word)
    // → 206835 − 1015·6/2 − 84600·6/6 = 206835 − 3045 − 84600 = 119190
    val dir = write((1L, "The cat sat. The dog ran!", "en"))
    val r = TextStats.qFleschReading(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("avg_flesch_milli") == 119190L)
    assert(r.head.getAs[Long]("n_easy") == 1L)
    assert(r.head.getAs[Long]("n_hard") == 0L)
  }

  test("flesch: polysyllabic prose scores hard; zero-word docs drop; fragment = 1 sentence") {
    // "Incomprehensibility characterizes obfuscation" (no terminator →
    // s = max(1, 0) = 1): w=3, syl = vowel runs:
    //  I-o-e-e-i-i-i-y(8) + a-a-e-i-e(5) + o-u-a-io(4) = 17
    // → 206835 − 1015·3/1 − 84600·17/3 = 206835 − 3045 − 479400 < 0
    val dir = write(
      (1L, "Incomprehensibility characterizes obfuscation", "en"),
      (2L, "12345 !!!", "en"), // zero words → excluded
      (3L, "Go now", "de"))    // fragment: s clamps to 1
    val r = TextStats.qFleschReading(spark, dir).collect()
      .map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("avg_flesch_milli"),
          x.getAs[Long]("n_hard")))).toMap
    assert(r.keySet == Set("en", "de")) // doc 2 contributes nowhere
    assert(r("en")._1 == 1L && r("en")._2 < 0L && r("en")._3 == 1L)
    // "Go now": w=2, s=1, syl=2 → 206835 − 2030 − 84600 = 120205
    assert(r("de") == ((1L, 120205L, 0L)))
  }
}
