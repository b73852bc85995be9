package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomUtil
import graft.operators.TextStats

/** Bloom filter machinery (bloom_agg / bloom_contains) and the
  * bloom-prefiltered decontamination path built on it. */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  // SQL-name access (bloom_agg/bloom_contains in selectExpr) needs the
  // function registry populated; idempotent across suites
  graft.plans.Graft.install(spark)

  test("bloom has zero false negatives over a multi-partition build") {
    val rnd = new scala.util.Random(42)
    val keys = Array.fill(10000)(rnd.nextLong())
    // 4 partitions exercise the partial-buffer OR-merge path
    val bf = keys.toSeq.toDF("h").repartition(4)
      .selectExpr("bloom_agg(h, 131072, 5) AS bf")
      .collect()(0).getAs[Array[Byte]](0)
    assert(bf.length === 131072 / 8)
    assert(keys.forall(BloomUtil.mightContain(bf, _, 5)))
  }

  test("bloom false-positive rate is in the designed band") {
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(10000)(rnd.nextLong())
    val bf = keys.toSeq.toDF("h")
      .selectExpr("bloom_agg(h, 131072, 5) AS bf")
      .collect()(0).getAs[Array[Byte]](0)
    val inserted = keys.toSet
    val probes = Array.fill(10000)(rnd.nextLong()).filterNot(inserted)
    val fp = probes.count(BloomUtil.mightContain(bf, _, 5))
    // m/n = 13.1 bits/key, k=5 → theoretical fp ≈ 0.5%; allow 4x slack
    assert(fp.toDouble / probes.length < 0.02, s"fp rate ${fp.toDouble / probes.length}")
  }

  test("bloom_contains is SQL-registered and codegen'd") {
    graft.plans.Graft.install(spark)
    val r = spark.sql(
      """SELECT bloom_contains(bf, hash, 5) AS hit FROM (
        |  SELECT (SELECT bloom_agg(xxhash64(s), 4096, 5)
        |          FROM VALUES ('alpha'), ('beta') AS t(s)) AS bf,
        |         xxhash64(v) AS hash
        |  FROM VALUES ('alpha'), ('beta'), ('gamma-not-inserted') AS u(v))
        |""".stripMargin)
    assert(r.collect().map(_.getBoolean(0)).take(2).forall(identity))
    // the probe must stay inside whole-stage codegen on the scan side
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"), plan)
  }

  private def writeDocs(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("bloomspec").toString
    rows.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bloom decontamination output is byte-identical to the exact variant") {
    // 120 docs over a tiny shared vocabulary: the ~5% eval slice is
    // non-empty w.h.p. and eval/train gram overlap is guaranteed
    val docs = (1L to 120L).map { i =>
      (i, s"alpha beta gamma delta epsilon w${i % 7} zeta eta")
    }
    val dir = writeDocs(docs: _*)
    val exact = TextStats.qDecontaminate(spark, dir).collect().map(_.toSeq)
    val bloom = TextStats.qBloomDecontaminate(spark, dir).collect().map(_.toSeq)
    assert(exact.nonEmpty)
    assert(exact.length < 120, "eval slice must be non-empty for a meaningful test")
    assert(exact.count(_(2) == true) > 0, "need at least one contaminated doc")
    assert(bloom.toSeq === exact.toSeq)
  }

  test("bloom decontamination plan: codegen probe + shuffled verify join") {
    val dir = writeDocs((1L to 120L).map(i => (i, s"alpha beta gamma d${i % 5}")): _*)
    val plan = TextStats.qBloomDecontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    // the map-side prefilter probe is present...
    assert(plan.contains("bloom_contains"), plan)
    // ...and the exact verify join honors the shuffle hint — the scale
    // contract is that NEITHER side of the verify join broadcasts
    assert(plan.contains("ShuffledHashJoin"), plan)
  }
}
