package graft

import java.nio.file.Files

import graft.operators.Dedup

/** qLshPrecision's verification must keep ROW WIDTH bounded: the
  * gram-level intersect join carries one gram per row, so a
  * pathologically large document in a candidate pair costs many ROWS
  * (distributed fine-grained work) instead of one multi-million-element
  * array in a single row (the collect_list verify form, which this spec
  * exists to keep out). Fixture: a ~100k-char document and its exact
  * duplicate (guaranteed LSH candidates — identical signatures), a
  * small duplicate pair, and unique decoys. */
class LshPrecisionBoundSpec extends SparkSpec {

  test("lsh precision verify: no per-doc gram arrays, correct on a giant-doc pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def randText(n: Int): String =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val giant = randText(100000) // ~25k distinct 8-grams at stride 4
    val small = randText(400)
    val rows = Seq(
      (1L, giant), (2L, giant),   // giant dup pair — the adversarial row
      (3L, small), (4L, small),   // ordinary dup pair
      (5L, randText(500)), (6L, randText(600))) // decoys
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = Files.createTempDirectory("graft-lshprec-spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val q = Dedup.qLshPrecision(spark, dir)
    val row = q.collect().head
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("collect_list"),
      s"per-doc gram arrays are back — unbounded row width:\n$plan")

    // both dup pairs are candidates (identical signatures) and both are
    // true near-dups (J = 1); seeded decoys don't collide
    assert(row.getAs[Long]("n_cand") == 2L, s"unexpected candidates: $row")
    assert(row.getAs[Long]("n_true") == 2L)
    assert(row.getAs[Long]("precision_pct") == 100L)
  }
}
