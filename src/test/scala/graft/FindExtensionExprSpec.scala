package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.Exprs

/** The native codegen expression ≡ the faithful Scala port, exercised
  * through SQL after function-registry registration (the
  * GraftExtensions path). */
class FindExtensionExprSpec extends SparkSpec {

  private def register(): Unit = {
    val reg = spark.sessionState.functionRegistry
    val (ident, info, builder) = GraftExtensions.findExtensionDescriptor
    if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
  }

  test("native expression matches Scala port on generated inputs") {
    import spark.implicits._
    register()
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('.'), Gen.const('/')))
      .map(_.mkString)
    val samples = ((1 to 400).flatMap(_ => gen.sample) ++
      // multi-byte regression: the char window [2,7] sees the dot at
      // char 3, but a byte window would miss it and wrap — the native
      // expression must be char-domain like its siblings
      Seq("a.tar.gz", "x.", ".hidden", "x.abcdefg.", "noext",
          "…ünïcode.éxt", "a.b.cdeéé", "ü.ü.üüüüü"))
      .distinct.filter(s => s != null && s.nonEmpty)
    val df = samples.toDF("p")
    val got = df.selectExpr("p", "find_extension(p) AS e")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    samples.foreach { s =>
      assert(got(s) == Option(Exprs.findExtensionScala(s)),
        s"native mismatch for '$s': got=${got(s)} want=${Option(Exprs.findExtensionScala(s))}")
    }
  }

  test("native expression agrees with the builtin-composed Column form") {
    import spark.implicits._
    register()
    val samples = Seq("a.tar.gz", "x.", ".hidden", "x.abcdefg.", "noext",
      "/a/b/c.txt", "dir.d/noext", "archive.backup")
    val df = samples.toDF("p")
    val r = df.selectExpr("p", "find_extension(p) AS native")
      .withColumn("composed", Exprs.findExtensionCol(col("p")))
      .filter(!(col("native") <=> col("composed")))
    assert(r.isEmpty, r.collect().mkString(","))
  }

  test("runs inside whole-stage codegen as a SQL builtin") {
    register()
    val r = spark.sql("SELECT find_extension('a.tar.gz') AS e").head().getString(0)
    assert(r == "tar.gz")
    // literals constant-fold through the interpreted path; a parquet
    // scan forces the expression through doGenCode inside a
    // WholeStageCodegen span
    val df = graft.Tables.part(spark, "/root/testdata/sf0.001")
      .selectExpr("p_partkey", "find_extension(p_name) AS e")
    val plan = df.queryExecution.executedPlan.toString
    // the '*' prefix is the WholeStageCodegen marker: the expression sits
    // inside the codegen'd Project, not behind a UDF boundary
    assert(plan.contains("*(1) Project") && plan.contains("find_extension"))
    assert(df.count() == 200) // and it executes without codegen errors
  }
}
