package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.crawl._

/** The eight report.py actions over an in-memory files/status pair. */
class ReportActionsSpec extends SparkSpec {

  def filesDf = {
    import spark.implicits._
    Seq(
      // path, ext, uid, gid, size, atime, mtime, ctime, owner
      ("/a/big_recent", "bin", 1L, 1L, 4000000000L, 100L, 999_000L, 999_000L, "alice"),
      ("/a/big_old", "bin", 1L, 1L, 4000000000L, 100L, 1000L, 1000L, "bob"),
      ("/a/small_recent", "txt", 2L, 2L, 10L, 100L, 999_000L, 999_000L, null)
    ).toDF("path", "extension", "st_uid", "st_gid", "st_size",
           "st_atime", "st_mtime", "st_ctime", "owner")
      .withColumn("insert_time", lit(new Timestamp(1_000_000_000L * 1000)))
  }

  def statusDf = {
    import spark.implicits._
    Seq(
      StatusRow(1, new Timestamp(1000), "begin", 0, "event"),
      StatusRow(2, new Timestamp(2000), "file rate", 10, "files/sec"),
      StatusRow(3, new Timestamp(3000), "file rate", 30, "files/sec"),
      StatusRow(4, new Timestamp(3000), "dir count", 7, "dirs"),
      StatusRow(5, new Timestamp(4000), "end", 0, "event")
    ).toDF()
  }

  test("large_old_files: size AND recency predicate (A9), column order") {
    // now = 1_000_000: big_recent qualifies (mtime+608400 >= now);
    // big_old fails recency; small_recent fails size
    val r = ReportActions.largeOldFiles(filesDf, 1_000_000L).collect()
    assert(r.map(_.getAs[String]("path")).toSeq == Seq("/a/big_recent"))
    val cols = ReportActions.largeOldFiles(filesDf, 1_000_000L).columns.toSeq
    assert(cols == Seq("insert_ts", "path", "ext", "uid", "gid", "size",
                       "atime", "ctime", "mtime", "owner")) // report.py:198-207
  }

  test("status-averages: only %rate metrics, avg per (status,units)") {
    val r = ReportActions.statusAverages(statusDf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("status") == "file rate")
    assert(r(0).getAs[Double]("avg") == 20.0)
  }

  test("status-brief: latest row per metric by id") {
    val r = ReportActions.statusBrief(statusDf).collect()
      .map(x => x.getAs[String]("status") -> x.getAs[Double]("value")).toMap
    assert(r("file rate") == 30.0) // id=3 beats id=2
    assert(r("dir count") == 7.0)
    assert(r.size == 4) // 4 distinct metrics (file rate collapsed)
  }

  test("status-events: units='event' filter") {
    val r = ReportActions.statusEvents(statusDf).collect().map(_.getAs[String]("status"))
    assert(r.toSeq == Seq("begin", "end"))
  }

  test("schema action lists columns like information_schema") {
    val r = ReportActions.schemaOf(statusDf, spark).collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r("id") == "bigint" && r("value") == "double" && r("status") == "string")
  }

  test("first_thousand caps at 1000 with total order") {
    assert(ReportActions.firstThousand(filesDf).count() == 3)
  }

  test("crawl statusRows: begin/end events + gauges + rates") {
    val ctrs = Crawl.counters(spark)
    ctrs.filesSeen.add(100); ctrs.dirsSeen.add(10); ctrs.totalSize.add(12345)
    val st = Crawl.statusRows(spark, ctrs, 1000L, 1010L)
    val byStatus = st.collect().map(r =>
      r.getAs[String]("status") -> (r.getAs[Double]("value"), r.getAs[String]("units"))).toMap
    assert(byStatus("begin")._2 == "event" && byStatus("end")._2 == "event")
    assert(byStatus("files seen")._1 == 100.0)
    assert(byStatus("file rate")._1 == 10.0) // 100 files / 10 sec
    // brief over generated status works end-to-end
    assert(ReportActions.statusBrief(st).count() == byStatus.size)
  }

  test("csvLine renders cells exactly as Python repr() (report.py:88-101)") {
    import ReportActions._
    // expected literals generated with CPython repr()/isoformat(' ')
    assert(pyRepr("it's") == "\"it's\"")
    assert(pyRepr("say \"hi\"") == "'say \"hi\"'")
    assert(pyRepr("both'\"") == "'both\\'\"'")
    assert(pyRepr("a,b") == "'a,b'")
    assert(pyRepr("tab\there\nnl") == "'tab\\there\\nnl'")
    assert(pyRepr(null) == "None")
    assert(pyRepr(true) == "True" && pyRepr(false) == "False")
    assert(pyRepr(42L) == "42" && pyRepr(7) == "7")
    // float layout: positional vs exponent exactly at Python's switches
    assert(pyRepr(2.0d) == "2.0")
    assert(pyRepr(1e7) == "10000000.0")
    assert(pyRepr(1e16) == "1e+16")
    assert(pyRepr(1.5e-7) == "1.5e-07")
    assert(pyRepr(0.0001) == "0.0001")
    assert(pyRepr(0.00001) == "1e-05")
    assert(pyRepr(-12345.678) == "-12345.678")
    assert(pyRepr(0.0d) == "0.0")
    assert(pyRepr(Double.NaN) == "nan")
    assert(pyRepr(Double.PositiveInfinity) == "inf")
    // datetimes: isoformat(' '), micros only when nonzero
    val utc = java.util.TimeZone.getTimeZone("UTC")
    val cal = java.util.Calendar.getInstance(utc)
    cal.clear(); cal.set(2021, 5, 1, 0, 0, 0)
    assert(pyRepr(new Timestamp(cal.getTimeInMillis)) == "2021-06-01 00:00:00")
    cal.clear(); cal.set(2021, 5, 1, 12, 30, 5)
    val withMicros = new Timestamp(cal.getTimeInMillis)
    withMicros.setNanos(123456000)
    assert(pyRepr(withMicros) == "2021-06-01 12:30:05.123456")
    // bytes literal (documented memoryview divergence)
    assert(pyRepr(Array[Byte]('a', 'b', 0xff.toByte, 0)) == "b'ab\\xff\\x00'")
    assert(pyRepr(new java.math.BigDecimal("123.45")) == "Decimal('123.45')")
    // non-printable unicode escapes exactly as CPython (NEL, NBSP, LS)
    assert(pyRepr("nel\u0085nbsp\u00a0") == "'nel\\x85nbsp\\xa0'")
    assert(pyRepr("line\u2028sep") == "'line\\u2028sep'")
    // bytes quote preference mirrors str
    assert(pyRepr("it's".getBytes("UTF-8")) == "b\"it's\"")
    assert(pyRepr("both'\"".getBytes("UTF-8")) == "b'both\\'\"'")
    // shortest round-trip digits where Java 17's toString has one extra
    assert(pyRepr(5.7223519193314771e17) == "5.722351919331477e+17")
    assert(pyRepr(1.7976931348623157e308) == "1.7976931348623157e+308")
    assert(pyRepr(java.lang.Double.MIN_VALUE) == "5e-324")
    // whole rows comma-join like ','.join(...)
    val line = csvLine(org.apache.spark.sql.Row("x,y", 1L, 2.0d, null))
    assert(line == "'x,y',1,2.0,None")
  }

  test("hardlink groups and physical-vs-logical usage over a real crawl") {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "linktree")
    val d = root.resolve("d")
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve("orig.dat"), "12345".getBytes)
    java.nio.file.Files.createLink(d.resolve("link.dat"), d.resolve("orig.dat"))
    java.nio.file.Files.write(d.resolve("solo.dat"), "abc".getBytes)
    val files = Crawl.run(spark, Seq(root.toString))

    val groups = ReportActions.hardlinkGroups(files).collect()
    assert(groups.length == 1, "exactly the orig/link pair groups")
    assert(groups.head.getAs[Long]("n_links") == 2)
    assert(groups.head.getAs[String]("canonical_path").endsWith("link.dat"),
      "min path is the canonical name")
    assert(groups.head.getAs[Long]("st_size") == 5L)

    val usage = ReportActions.physicalUsage(files).collect().head
    // physical: 5 (inode once) + 3 (solo); logical: 5*2 + 3
    assert(usage.getAs[Long]("physical_bytes") == 8L)
    assert(usage.getAs[Long]("logical_bytes") == 13L)
    assert(usage.getAs[Long]("n_inodes") == 2L)
  }

  test("progress listener: one line per 10k-analog boundary (log-listener cadence)") {
    val root = new CrawlSpec().mkTree()
    val ctrs = Crawl.counters(spark)
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = ProgressListener.register(spark, ctrs, every = 3, log = lines.add(_))
    try {
      val n = Crawl.run(spark, Seq(root.toString), ctrs = Some(ctrs)).count()
      // listener bus is async — poll briefly for delivery
      val deadline = System.nanoTime() + 10e9.toLong
      while (lines.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(n >= 3, "fixture too small for the cadence test")
      assert(!lines.isEmpty, "no progress line emitted")
      val line = lines.peek()
      assert(line.startsWith("[crawl] total count") && line.contains("files"),
        s"unexpected format: $line")
      // cadence, not per-task spam: at most one line per `every` records
      assert(lines.size <= n / 3 + 1, s"${lines.size} lines for $n records")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("dispatch: bare 'status' aliases status-brief, actions case-insensitive (report.py:217-225)") {
    val brief = ReportActions.run(spark, "status-brief", filesDf, statusDf).collect()
    val alias = ReportActions.run(spark, "status", filesDf, statusDf).collect()
    assert(alias.toSeq == brief.toSeq)
    // report.py lowercases config.action before dispatch — mixed case works
    val upper = ReportActions.run(spark, "Status-Events", filesDf, statusDf)
      .collect().map(_.getAs[String]("status"))
    assert(upper.toSeq == Seq("begin", "end"))
    // unknown actions still fail loudly
    assertThrows[RuntimeException](
      ReportActions.run(spark, "nonsense", filesDf, statusDf))
  }
}
