package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** Per-source bounded-heap reservoir sampler: value equivalence against
  * a window-function twin, plus the plan property that justifies it —
  * no window sort of the corpus. */
class ReservoirSampleSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(n: Int, sources: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("resv").toString
    (1 to n).map(i => (i.toLong, s"text $i", s"src${i % sources}"))
      .toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("reservoir equals the row_number twin, k per source, rank order") {
    val dir = writeDocs(500, 7)
    val got = TextStats.qReservoirSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // twin: the plain window formulation
    val h = graft.functions.Exprs.md5Long(concat(lit("resv|"), col("doc_id").cast("string")))
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"), h.as("h"))
      .withColumn("rnk",
        row_number().over(Window.partitionBy("source").orderBy(col("h").desc, col("doc_id")))
          .cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("source"), col("rnk"), col("doc_id"), col("h"))
      .orderBy("source", "rnk")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 7 * 5)
    assert(got.toSeq === want.toSeq)
  }

  test("a source smaller than k yields all its docs") {
    val dir = writeDocs(12, 5) // sources of size 2-3 < k=5
    val got = TextStats.qReservoirSample(spark, dir).collect()
    assert(got.length === 12)
  }

  test("plan: bounded-heap aggregate, no window over the corpus") {
    val dir = writeDocs(100, 4)
    val plan = TextStats.qReservoirSample(spark, dir)
      .queryExecution.executedPlan.toString
    // the heap agg plans as an object-hash aggregate named top_k...
    assert(plan.contains("top_k"), plan)
    // ...and there is NO WindowExec anywhere: the hot-source sort the
    // operator exists to avoid must not sneak back in
    assert(!plan.contains("Window"), plan)
  }
}
