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
}
