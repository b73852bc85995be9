package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.crawl.{Crawl, RawEntry, StatEnricher}

/** Breadth coverage: partitioned sink with partition pruning, session
  * windows, the A3 stat-error branch, and sketch aggregates. */
class BreadthSpec extends SparkSpec {

  test("partitioned files sink: owner partitions prune at scan") {
    import spark.implicits._
    val df = Seq(
      ("/a/x", 10L, "alice"), ("/a/y", 20L, "alice"),
      ("/b/z", 30L, "bob"), ("/c/w", 40L, null)
    ).toDF("path", "st_size", "owner")
    val out = Files.createTempDirectory(Paths.get("target"), "partsink").toString
    df.write.mode("overwrite").partitionBy("owner").parquet(out)
    val scan = spark.read.parquet(out).filter(col("owner") === "alice")
    val plan = scan.queryExecution.executedPlan.toString
    // the owner predicate must become a PartitionFilter (pruned
    // directories), not a post-scan filter
    assert(plan.contains("PartitionFilters") && plan.contains("alice"),
      s"no partition pruning in:\n$plan")
    assert(scan.count() == 2)
  }

  test("session_window groups events separated by inactivity gaps") {
    import spark.implicits._
    val t0 = 1700000000L
    val ev = Seq(
      (new Timestamp(t0 * 1000), "u1"),
      (new Timestamp((t0 + 10) * 1000), "u1"),   // same session (gap 10 < 60)
      (new Timestamp((t0 + 300) * 1000), "u1"),  // new session (gap 290)
      (new Timestamp((t0 + 5) * 1000), "u2")
    ).toDF("ts", "user")
    val sessions = ev
      .groupBy(session_window(col("ts"), "60 seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sessions.count(_._1 == "u1") == 2) // two sessions for u1
    assert(sessions.filter(_._1 == "u1").map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(sessions.count(_._1 == "u2") == 1)
  }

  test("A3 divergence: stat error yields null stats + error column") {
    val bogus = RawEntry("/nonexistent/definitely/missing", "/nonexistent", "missing",
      isDir = false, isSymlink = false)
    import spark.implicits._
    val m = StatEnricher.enrich(Seq(bogus).toDS()).collect().head
    assert(m.error.isDefined)
    assert(m.st_size.isEmpty && m.st_ino.isEmpty && m.st_mode.isEmpty)
    assert(m.path == bogus.path)
  }

  test("ORC source/sink round-trip for the files table") {
    val root = new CrawlSpec().mkTree()
    val df = Crawl.run(spark, Seq(root.toString))
    val out = Files.createTempDirectory(Paths.get("target"), "orcsink").toString
    df.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == df.count())
    assert(back.schema.fieldNames.toSet == df.schema.fieldNames.toSet)
    // pushdown works against ORC too
    val plan = back.filter(col("st_size") > 0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(st_size"))
  }

  test("CSV source/sink round-trip preserves hostile values") {
    import spark.implicits._
    val df = Seq(
      ("/a/x,with,commas", 10L, "line\nbreak owner"),
      ("/b/\"quoted\"", 20L, null)
    ).toDF("path", "st_size", "owner")
    val out = Files.createTempDirectory(Paths.get("target"), "csvsink").toString
    df.write.mode("overwrite").option("header", true).option("escape", "\"")
      .csv(out)
    val back = spark.read.option("header", true).option("escape", "\"")
      .option("multiLine", true)
      .schema("path STRING, st_size LONG, owner STRING").csv(out)
    val rows = back.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(
      ("/a/x,with,commas", 10L, "line\nbreak owner"),
      ("/b/\"quoted\"", 20L, null)))
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark on event ids") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      input.addData((new Timestamp(t0 * 1000), 1L), (new Timestamp(t0 * 1000), 1L),
                    (new Timestamp((t0 + 5) * 1000), 2L))
      q.processAllAvailable()
      input.addData((new Timestamp((t0 + 10) * 1000), 1L)) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L)) // each id exactly once
    } finally q.stop()
  }

  test("multi-root crawl unions all roots into one frontier (U1)") {
    val rootA = new CrawlSpec().mkTree()
    val rootB = new CrawlSpec().mkTree()
    val both = Crawl.run(spark, Seq(rootA.toString, rootB.toString))
    val a = Crawl.run(spark, Seq(rootA.toString))
    val b = Crawl.run(spark, Seq(rootB.toString))
    assert(both.count() == a.count() + b.count())
    val paths = both.select("path").collect().map(_.getString(0)).toSet
    assert(paths.exists(_.startsWith(rootA.toString)))
    assert(paths.exists(_.startsWith(rootB.toString)))
  }

  test("sketch aggregates: approx_count_distinct within tolerance of exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("rendezvous shards: partition of the corpus, moves only to the new shard") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.operators.Relational.qRendezvousShards(spark, sf).collect()
    assert(r.map(_.getAs[Long]("shard")).toSeq === (0L to 7L))
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === nDocs)
    // HRW's defining invariant: adding shard 8 never re-ranks the old 8
    assert(r.forall(_.getAs[Long]("n_moved_elsewhere") === 0L))
    // expected displacement is 1/9 of the corpus; binomial spread is
    // wide at 500 docs, so assert a loose band around 111 permille
    val moved = r.map(_.getAs[Long]("n_moved")).sum
    assert(moved * 1000 / nDocs > 30 && moved * 1000 / nDocs < 250,
      s"moved=$moved of $nDocs")
  }
}
