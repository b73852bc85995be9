package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.crawl.{Crawl, CrawlDiff}

/** Snapshot diff over two REAL crawls of a mutated directory tree:
  * added/removed/modified classification, size deltas, and the
  * summary rollup.
  */
class CrawlDiffSpec extends SparkSpec {

  private def write(p: Path, bytes: Int): Unit =
    Files.write(p, Array.fill[Byte](bytes)('x'))

  test("diff classifies added/removed/modified with size deltas") {
    val root = Files.createTempDirectory("graft-diff")
    Files.createDirectory(root.resolve("sub"))
    write(root.resolve("keep.txt"), 10)
    write(root.resolve("grow.txt"), 5)
    write(root.resolve("gone.txt"), 7)
    val before = Crawl.run(spark, Seq(root.toString)).cache()
    before.count()

    write(root.resolve("grow.txt"), 25)      // modified (+20 bytes)
    write(root.resolve("sub/new.txt"), 4)    // added
    Files.delete(root.resolve("gone.txt"))   // removed
    val after = Crawl.run(spark, Seq(root.toString)).cache()
    after.count()

    val d = CrawlDiff.diff(before, after)
    val byPath = d.collect()
      .map(r => r.getAs[String]("path") -> r).toMap

    assert(byPath(root.resolve("sub/new.txt").toString).getAs[String]("change") === "added")
    assert(byPath(root.resolve("sub/new.txt").toString).getAs[Long]("size_delta") === 4L)
    assert(byPath(root.resolve("gone.txt").toString).getAs[String]("change") === "removed")
    assert(byPath(root.resolve("gone.txt").toString).getAs[Long]("size_delta") === -7L)
    val grow = byPath(root.resolve("grow.txt").toString)
    assert(grow.getAs[String]("change") === "modified")
    assert(grow.getAs[Long]("old_st_size") === 5L)
    assert(grow.getAs[Long]("new_st_size") === 25L)
    assert(grow.getAs[Long]("size_delta") === 20L)
    // keep.txt unchanged → absent (mtime preserved because content untouched)
    assert(!byPath.contains(root.resolve("keep.txt").toString))
    // but present when asked for
    val all = CrawlDiff.diff(before, after, includeUnchanged = true).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[String]("change")).toMap
    assert(all(root.resolve("keep.txt").toString) === "unchanged")

    val sum = CrawlDiff.summary(d).collect()
      .map(r => r.getAs[String]("change") -> (r.getAs[Long]("n_paths"), r.getAs[Long]("net_bytes")))
      .toMap
    assert(sum("added") === ((1L, 4L)))
    assert(sum("removed") === ((1L, -7L)))
    // grow.txt modified; the dir "sub" may also flip modified (mtime
    // changed when new.txt landed in it) — assert the file's byte delta
    // is in the rollup
    assert(sum("modified")._2 === 20L)
    before.unpersist(); after.unpersist()
  }

  test("diff of identical snapshots is empty") {
    val root = Files.createTempDirectory("graft-diff2")
    write(root.resolve("a.txt"), 3)
    val s1 = Crawl.run(spark, Seq(root.toString)).cache(); s1.count()
    val s2 = Crawl.run(spark, Seq(root.toString)).cache(); s2.count()
    assert(CrawlDiff.diff(s1, s2).count() === 0L)
    s1.unpersist(); s2.unpersist()
  }
}
