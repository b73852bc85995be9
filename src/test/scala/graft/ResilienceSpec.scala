package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

/** Operational resilience at 100 TB: runtime re-planning and tolerant
  * reads. A fleet-sized pipeline WILL meet mis-estimated join sides,
  * mixed-schema parquet eras, and the occasional truncated file; these
  * pin the engine behaviors that absorb each. */
class ResilienceSpec extends SparkSpec {

  test("AQE flips a mis-planned sort-merge join to broadcast at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // static planning believes nothing is broadcastable; at runtime
      // the dim's actual shuffle size is tiny and AQE re-plans
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      val ord = Tables.orders(spark, "/root/testdata/sf0.001")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val q = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val finalPart = plan.split("== Initial Plan ==").head
      assert(finalPart.contains("BroadcastHashJoin"),
        s"AQE did not re-plan to broadcast:\n$plan")
      assert(!finalPart.contains("SortMergeJoin"), "final plan still sort-merge")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  test("schema evolution: mixed-era parquet reads as the merged schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // era 1: (doc_id, text); era 2 adds a quality column
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/era=1")
    Seq((3L, "gamma", 9L)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/era=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq == Seq("doc_id", "era", "quality", "text"))
    val rows = df.orderBy("doc_id")
      .select("doc_id", "quality").collect()
    assert(rows.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq
      == Seq(-1L, -1L, 9L), "old-era rows must read the new column as null")
  }

  test("ignoreCorruptFiles: a truncated fragment doesn't kill the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-corrupt").toString
    Seq.tabulate(100)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(4).write.parquet(s"$dir/data")
    // truncate one fragment mid-file: unreadable footer
    val victim = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val bytes = Files.readAllBytes(victim)
    Files.write(victim, bytes.take(bytes.length / 2),
      StandardOpenOption.TRUNCATE_EXISTING)

    val conf = spark.conf
    val saved = conf.getOption("spark.sql.files.ignoreCorruptFiles")
    try {
      conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      // pin the schema (as a production pipeline would): whether
      // footer INFERENCE survives a corrupt file depends on which file
      // the reader samples first — the contract under test is the
      // SCAN's tolerance, which ignoreCorruptFiles defines
      val n = spark.read
        .schema("doc_id BIGINT, text STRING")
        .parquet(s"$dir/data").count()
      // the other three fragments survive; the corrupt one is skipped
      assert(n > 0 && n < 100, s"expected partial read, got $n")
    } finally {
      saved match {
        case Some(v) => conf.set("spark.sql.files.ignoreCorruptFiles", v)
        case None => conf.unset("spark.sql.files.ignoreCorruptFiles")
      }
    }
  }
}
