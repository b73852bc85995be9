package graft

import java.nio.file.{Files, Paths}

import graft.crawl.{CrawlFsPartition, CrawlFsScan, FsScanner, PathBytes, StatEnricher}

/** Byte-fidelity of the crawl (reference bytea parity,
  * storcrawl.py:132-148) and the DSv2 planner's driver-memory bound. */
class BinaryPathSpec extends SparkSpec {

  /** A filename containing 0xff — invalid in UTF-8 and ASCII alike, so
    * any String round-trip mangles it. */
  private val badName = Array[Byte](
    'b'.toByte, 'a'.toByte, 'd'.toByte, '_'.toByte, 0xff.toByte,
    0xfe.toByte, '_'.toByte, 'f'.toByte)

  test("pathMode=binary round-trips a non-UTF-8 filename and stats it") {
    assume(PathBytes.enabled, "needs --add-opens java.base/sun.nio.fs")
    val dir = Files.createTempDirectory("graft-bytes")
    val bad = PathBytes.toPath(
      PathBytes.child(PathBytes.fromPath(dir), badName))
    Files.write(bad, Array[Byte](1, 2, 3))
    Files.write(dir.resolve("plain.txt"), Array[Byte](9))

    val rows = spark.read.format("graft.crawl.CrawlFsProvider")
      .option("roots", dir.toString)
      .option("pathMode", "binary")
      .load()
      .collect()
    assert(rows.length == 2)
    val byName = rows.map(r => r.getAs[Array[Byte]]("name").toSeq -> r).toMap
    val badRow = byName(badName.toSeq)
    // stat WORKED on the undecodable name (a String-path stat cannot)
    assert(badRow.getAs[Any]("st_size") == 3L)
    assert(badRow.getAs[Any]("error") == null)
    // full path bytes are the exact on-disk bytes
    assert(badRow.getAs[Array[Byte]]("path").toSeq ==
      PathBytes.fromPath(bad).toSeq)
    assert(byName(("plain.txt": Seq[Char]).map(_.toByte))
      .getAs[Any]("st_size") == 1L)
  }

  test("BFS scanner descends through a non-UTF-8 directory name") {
    assume(PathBytes.enabled, "needs --add-opens java.base/sun.nio.fs")
    val root = Files.createTempDirectory("graft-bytes-dir")
    val badDir = PathBytes.toPath(
      PathBytes.child(PathBytes.fromPath(root), badName))
    Files.createDirectory(badDir)
    Files.write(badDir.resolve(
      PathBytes.toPath("inner.txt".getBytes("UTF-8"))), Array[Byte](7, 7))

    val scanned = FsScanner.scan(spark, Seq(root.toString))
    val entries = scanned.collect()
    assert(entries.length == 2) // the bad dir + the file inside it
    import spark.implicits._
    val inner = entries.find(_.name == "inner.txt").get
    val meta = StatEnricher.enrich(spark.createDataset(Seq(inner)))
      .collect().head
    assert(meta.error.isEmpty && meta.st_size.contains(2L))
  }

  test("planner defers directories once the loose-entry budget is spent") {
    val root = Files.createTempDirectory("graft-loose")
    (0 until 5).foreach { i =>
      val d = Files.createDirectory(root.resolve(f"d$i"))
      (0 until 50).foreach(j => Files.write(d.resolve(f"f$j.dat"), Array[Byte](1)))
    }
    val scan = new CrawlFsScan(
      Seq(root.toString), Set.empty, targetParts = 64, maxLoose = 60,
      binaryPaths = false, overSub = 1)
    val parts = scan.planInputPartitions().map(_.asInstanceOf[CrawlFsPartition])
    val nLoose = parts.map(_.loose.size).sum
    val nUnits = parts.map(p => p.subtrees.size + p.shallow.size).sum
    // bounded buffering: budget + at most one directory's overshoot
    assert(nLoose <= 60 + 50)
    // the over-budget directories became executor-side units (dir-only
    // shallow listings or subtree walks), not driver buffers
    assert(nUnits >= 3)
    // and nothing is lost: the full read still sees all 255 entries
    val n = spark.read.format("graft.crawl.CrawlFsProvider")
      .option("roots", root.toString)
      .option("maxLooseEntries", "60")
      .load().count()
    assert(n == 255)
  }
}
