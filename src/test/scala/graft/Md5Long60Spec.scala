package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins [[graft.functions.Md5Long60Expr]] (digest-bytes fast path, r16)
  * value-identical to the legacy `conv(substring(md5(c),1,15),16,10)`
  * spelling — the contract every md5Long consumer and the DuckDB
  * oracle's `CAST('0x'||substr(md5(s),1,15) AS BIGINT)` twin rely on.
  */
class Md5Long60Spec extends SparkSpec {

  import spark.implicits._

  test("digest-bytes md5Long equals the conv/substring spelling on varied inputs") {
    val rows = Seq(
      "", "a", "hello world", "eval|42", "hnsw|511",
      "élève", "漢字テスト", "emoji 😀 tail",
      "x" * 500, "multi word gram here", "0", "-1", "| | |")
      .toDF("s")
    val cmp = rows.select(
      graft.functions.Exprs.md5Long(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast(LongType).as("legacy"))
    val bad = cmp.filter(col("fast") =!= col("legacy") ||
      col("fast").isNull =!= col("legacy").isNull).count()
    assert(bad === 0L)
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(graft.functions.Exprs.md5Long(col("s")).as("v")).head()
    assert(n.isNullAt(0))
    // non-negative 60-bit range over a deterministic id sweep
    val sweep = spark.range(0, 2000)
      .select(graft.functions.Exprs.md5Long(concat(lit("k|"), col("id"))).as("v"),
        conv(substring(md5(concat(lit("k|"), col("id"))), 1, 15), 16, 10)
          .cast(LongType).as("legacy"))
    assert(sweep.filter(col("v") =!= col("legacy")).count() === 0L)
    assert(sweep.filter(col("v") < 0 || col("v") >= (1L << 60)).count() === 0L)
  }

  test("half=1 equals the conv/substring(…,17,15) spelling") {
    val sweep = spark.range(0, 2000)
      .select(
        graft.functions.Exprs.md5LongHalf(
          concat(lit("b|"), col("id")), 1).as("v"),
        conv(substring(md5(concat(lit("b|"), col("id"))), 17, 15), 16, 10)
          .cast(LongType).as("legacy"))
    assert(sweep.filter(col("v") =!= col("legacy") ||
      col("v") < 0 || col("v") >= (1L << 60)).count() === 0L)
  }
}
