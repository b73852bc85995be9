package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CounterSample, StatusStream}

/** T1/T2 — windowed status rates through a real Structured Streaming
  * micro-batch execution (MemoryStream → window agg → memory sink). */
class StreamingSpec extends SparkSpec {

  test("windowedRates aggregates per 60s window per metric") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("time", "status", "value")
    val rates = StatusStream.windowedRates(stream)
    val q = rates.writeStream
      .format("memory")
      .queryName("rates_out")
      .outputMode("append")
      .start()
    try {
      val t0 = 1700000000L
      input.addData(
        (new Timestamp(t0 * 1000), "file_rate", 10.0),
        (new Timestamp((t0 + 30) * 1000), "file_rate", 20.0),
        (new Timestamp((t0 + 90) * 1000), "dir_rate", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((new Timestamp((t0 + 600) * 1000), "file_rate", 1.0))
      q.processAllAvailable()
      val out = spark.table("rates_out")
        .select("status", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out.contains(("file_rate", 2L, 30.0)))
      assert(out.contains(("dir_rate", 1L, 5.0)))
    } finally q.stop()
  }

  test("file-source stream: parquet landing dir drives windowedRates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "statstream")
    val ckpt = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "statckpt")
    val t0 = 1700000000L
    // first landing file
    Seq((new Timestamp(t0 * 1000), "file_rate", 10.0),
        (new Timestamp((t0 + 30) * 1000), "file_rate", 20.0))
      .toDF("time", "status", "value")
      .write.mode("append").parquet(dir.toString)
    val stream = spark.readStream
      .schema("time TIMESTAMP, status STRING, value DOUBLE")
      .parquet(dir.toString)
    val q = StatusStream.windowedRates(stream)
      .writeStream.format("memory").queryName("file_rates")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second landing file advances the watermark past the first window
      Seq((new Timestamp((t0 + 600) * 1000), "file_rate", 1.0))
        .toDF("time", "status", "value")
        .write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val out = spark.table("file_rates")
        .select("status", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out.contains(("file_rate", 2L, 30.0)))
    } finally q.stop()
  }

  test("sessionRollup: gap-separated bursts become separate sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("time", "status", "value")
    val q = StatusStream.sessionRollup(stream, gap = "60 seconds",
        watermark = "120 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      // burst 1: three events inside one 60s-gap session
      input.addData(
        (new Timestamp(t0 * 1000), "files", 1.0),
        (new Timestamp((t0 + 30) * 1000), "files", 2.0),
        (new Timestamp((t0 + 59) * 1000), "files", 3.0))
      q.processAllAvailable()
      // burst 2 after a 300s silence, then advance the watermark
      input.addData((new Timestamp((t0 + 400) * 1000), "files", 7.0))
      q.processAllAvailable()
      input.addData((new Timestamp((t0 + 2000) * 1000), "files", 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions_out")
        .select("n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(out.contains((3L, 6.0)), s"burst 1 merged session: $out")
      assert(out.contains((1L, 7.0)), s"burst 2 own session: $out")
    } finally q.stop()
  }

  test("dedupedSamples: re-delivered samples dropped within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("time", "status", "value")
    val q = StatusStream.dedupedSamples(stream)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      input.addData(
        (new Timestamp(t0 * 1000), "files", 1.0),
        (new Timestamp(t0 * 1000), "files", 1.0), // same-batch duplicate
        (new Timestamp(t0 * 1000), "dirs", 2.0))
      q.processAllAvailable()
      // re-delivery in a later micro-batch, still inside the watermark
      input.addData((new Timestamp(t0 * 1000), "files", 1.0))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.length == 2, s"expected 2 unique samples, got ${out.length}")
    } finally q.stop()
  }

  test("statusSink recovery: checkpoint resume + forced batch replay stay exactly-once") {
    import spark.implicits._
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), p).toString
    val landing = tmp("sinkland")
    val ckpt = tmp("sinkckpt")
    val outDir = tmp("sinkout")
    val t0 = 1700000000L
    def startSink(checkpoint: String) = StatusStream.statusSink(
      spark.readStream
        .schema("time TIMESTAMP, status STRING, value DOUBLE")
        .parquet(landing),
      outDir, checkpoint, cadence = "1 seconds").start()

    // run 1: two rows land, batch 0 commits, then the stream "dies"
    Seq((new Timestamp(t0 * 1000), "files", 10.0),
        (new Timestamp((t0 + 30) * 1000), "files", 20.0))
      .toDF("time", "status", "value")
      .write.mode("append").parquet(landing)
    val q1 = startSink(ckpt)
    q1.processAllAvailable()
    q1.stop()

    // simulate the worst crash point: sink output was written but the
    // checkpoint commit was lost — Spark must REPLAY that batch on
    // restart, and the idempotent per-batch overwrite must not double.
    // (The surgery happens on a COPY of the checkpoint: Spark's
    // same-JVM metadata-log cache would flag in-place deletion as a
    // concurrent query; a copied path is exactly the restart-from-
    // backup-checkpoint crash shape.)
    import scala.jdk.CollectionConverters._
    val ckpt2 = tmp("sinkckpt2")
    java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach { src =>
        val dst = java.nio.file.Paths.get(ckpt2)
          .resolve(java.nio.file.Paths.get(ckpt).relativize(src))
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.copy(src, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    val commits = java.nio.file.Paths.get(ckpt2, "commits")
    val maxCommit = java.nio.file.Files.list(commits).iterator().asScala
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(maxCommit)
    // and its Hadoop checksum companion — a stale .N.crc makes the
    // local filesystem's atomic rewrite fail as a phantom conflict
    java.nio.file.Files.deleteIfExists(
      commits.resolve("." + maxCommit.getFileName.toString + ".crc"))

    // more data lands while "down"
    Seq((new Timestamp((t0 + 90) * 1000), "dirs", 5.0))
      .toDF("time", "status", "value")
      .write.mode("append").parquet(landing)

    // run 2: resumes from the copied checkpoint, replays batch 0, takes batch 1
    val q2 = startSink(ckpt2)
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
      .select("status", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(out.length == 3, s"exactly-once violated: ${out.toSeq.sorted}")
    assert(out.toSet == Set(("files", 10.0), ("files", 20.0), ("dirs", 5.0)))
  }

  test("stream-static broadcast enrichment join attaches dimension columns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("files seen", "count"), ("file rate", "rate"))
      .toDF("status", "kind")
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StatusStream.enriched(
        input.toDF().toDF("time", "status", "value"), dim, "status")
      .writeStream.format("memory").queryName("enriched_out")
      .outputMode("append").start()
    try {
      input.addData(
        (new Timestamp(1700000000L * 1000), "files seen", 10.0),
        (new Timestamp(1700000000L * 1000), "unknown metric", 1.0))
      q.processAllAvailable()
      val out = spark.table("enriched_out")
        .select("status", "kind").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out("files seen") == "count")
      assert(out("unknown metric") == null) // left join keeps unmatched rows
    } finally q.stop()
  }

  test("statusJdbcSink streams micro-batches into a live database (derby)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), p).toString
    val url = s"jdbc:derby:${tmp("derbystream")}/sdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val errs = graft.crawl.Crawl.bootstrapReportingRole(
      conn, graft.crawl.PgDdl.schemaBootstrap("crawl_s", "derby"))
    assert(errs.isEmpty, s"$errs")

    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StatusStream.statusJdbcSink(
      input.toDF().toDF("time", "status", "value"),
      url, "crawl_s", user = "", password = "",
      checkpoint = tmp("sjckpt"), cadence = "1 seconds").start()
    try {
      val t0 = 1700000000L
      input.addData(
        (new Timestamp(t0 * 1000), "files seen", 10.0),
        (new Timestamp((t0 + 60) * 1000), "files seen", 25.0))
      q.processAllAvailable()
      input.addData((new Timestamp((t0 + 120) * 1000), "dirs seen", 3.0))
      q.processAllAvailable()
      val rs = conn.createStatement()
        .executeQuery("SELECT entry FROM crawl_s.status")
      val entries = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString(1)).toVector
      assert(entries.size == 3, s"expected 3 status entries, got $entries")
      assert(entries.count(_.contains("files seen")) == 2)
      assert(entries.forall(_.startsWith("{")), "entries are json blobs")
    } finally { q.stop(); conn.close() }
  }

  test("counterRates: stateful (now-prev)/interval across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CounterSample]
    val rates = StatusStream.counterRates(input.toDS())
    val q = rates.writeStream
      .format("memory").queryName("counter_rates")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      // batch 1: first samples → no rate yet (no previous state)
      input.addData(CounterSample(new Timestamp(t0 * 1000), "files", 100.0))
      q.processAllAvailable()
      assert(spark.table("counter_rates").count() == 0)
      // batch 2: 60s later the counter reads 220 → rate (220-100)/60 = 2
      input.addData(CounterSample(new Timestamp((t0 + 60) * 1000), "files", 220.0))
      // and a second metric starts
      input.addData(CounterSample(new Timestamp((t0 + 60) * 1000), "dirs", 5.0))
      q.processAllAvailable()
      val out = spark.table("counter_rates")
        .select("status", "rate").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(out == Set(("files rate", 2.0)))
      // batch 3: dirs ticks too
      input.addData(CounterSample(new Timestamp((t0 + 120) * 1000), "dirs", 65.0))
      q.processAllAvailable()
      val out2 = spark.table("counter_rates")
        .select("status", "rate").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(out2 == Set(("files rate", 2.0), ("dirs rate", 1.0)))
    } finally q.stop()
  }

  test("pairedWithin: stream-stream interval join bounds pairs by key and window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Timestamp, String, Double)]
    val samples = MemoryStream[(Timestamp, String, Double)]
    val joined = StatusStream.pairedWithin(
      events.toDF().toDF("time", "status", "value"),
      samples.toDF().toDF("time", "status", "value"), windowSec = 120)
    val q = joined.writeStream
      .format("memory").queryName("paired_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      def ts(s: Long) = new Timestamp(s * 1000)
      events.addData((ts(t0), "file_rate", 1.0))
      samples.addData(
        (ts(t0 + 30), "file_rate", 10.0),   // in window, same key → pair
        (ts(t0 + 90), "file_rate", 20.0),   // in window, same key → pair
        (ts(t0 + 300), "file_rate", 30.0),  // outside the 120s window
        (ts(t0 + 30), "dir_rate", 99.0))    // wrong key
      q.processAllAvailable()
      val out = spark.table("paired_out")
        .select("status", "sample_value").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(out == Set(("file_rate", 10.0), ("file_rate", 20.0)),
        s"unexpected pairs: $out")
    } finally q.stop()
  }
}
