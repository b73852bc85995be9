package graft

/** Pins the [[Tables]] memoization contract: immutable-once-read, with
  * boundary-aware invalidation — invalidate("/x/out") must not evict a
  * sibling directory "/x/out2" (over-invalidation is correctness-safe
  * but silently defeats the memoization). */
class TablesSpec extends SparkSpec {

  test("invalidate is separator-boundary-aware: siblings stay memoized") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tables-spec").toString
    val out = s"$tmp/out"
    val out2 = s"$tmp/out2"
    Seq(1).toDF("v").write.parquet(s"$out/t.parquet")
    Seq(1).toDF("v").write.parquet(s"$out2/t.parquet")
    assert(Tables.table(spark, out, "t").count() === 1L)
    assert(Tables.table(spark, out2, "t").count() === 1L)

    // append under BOTH dirs (append keeps the old part-files, so a
    // stale cached listing reads stale DATA, not a missing file);
    // invalidate only `out`
    Seq(2).toDF("v").write.mode("append").parquet(s"$out/t.parquet")
    Seq(2).toDF("v").write.mode("append").parquet(s"$out2/t.parquet")
    Tables.invalidate(out)
    assert(Tables.table(spark, out, "t").count() === 2L,
      "invalidated path must be re-read")
    assert(Tables.table(spark, out2, "t").count() === 1L,
      "sibling dir sharing the string prefix must KEEP its cached reader")

    // exact-path invalidation (a file key, no trailing-slash ambiguity)
    Tables.invalidate(s"$out2/t.parquet")
    assert(Tables.table(spark, out2, "t").count() === 2L)
    Tables.invalidate(tmp) // leave no cross-test residue
  }
}
