package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.crawl._

/** End-to-end crawl pipeline over a generated fixture tree
  * (FIXTURES.md §2): exclusion pruning (A4), symlink non-descent,
  * roots-not-rows (A5), stat enrichment, owner attribution with both
  * J1 plans, first-wins owners dedup. */
class CrawlSpec extends SparkSpec {

  /** Builds the FIXTURES.md §2.1 tree under target/ (inside the repo). */
  def mkTree(): Path = {
    val root = Files.createTempDirectory(Paths.get("target"), "crawltree")
    def touch(p: Path, content: String = "x"): Path = {
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes)
    }
    touch(root.resolve("projA/a.tar.gz"), "data1")
    touch(root.resolve("projA/ünïcode fïle.txt"))
    touch(root.resolve("projA/sp ace's.dat"))
    touch(root.resolve("projA/noext"))
    touch(root.resolve("projA/sub/x."))
    touch(root.resolve("projB/archive.backup"))
    touch(root.resolve("projB/dir.d/inner"))
    touch(root.resolve(".snapshot/hidden_file")) // excluded: not descended
    Files.createDirectories(root.resolve("linktarget"))
    touch(root.resolve("linktarget/inside_link"))
    Files.createSymbolicLink(root.resolve("projB/sym"), root.resolve("linktarget"))
    root
  }

  def mkOwners(root: Path): Path = {
    val f = root.resolve("owners.txt")
    Files.write(f, (
      s"alice=${root.resolve("projA")}\n" +
      s"bob=${root.resolve("projB/dir.d")}:${root.resolve("linktarget")}\n" +
      s"carol=${root.resolve("projA")}:Nothing\n" + // dup dir → first wins (alice)
      s"dan=${root.resolve("projB")}\n").getBytes)
    f
  }

  test("scan: exclusion recorded-not-descended, symlink not descended, roots absent") {
    val root = mkTree()
    val entries = FsScanner.scan(spark, Seq(root.toString)).collect()
    val paths = entries.map(_.path).toSet
    // the excluded dir itself IS an entry (A4)…
    assert(paths.contains(root.resolve(".snapshot").toString))
    // …but nothing below it
    assert(!paths.contains(root.resolve(".snapshot/hidden_file").toString))
    // symlink is an entry, its target's children only via the real path
    assert(paths.contains(root.resolve("projB/sym").toString))
    assert(!paths.contains(root.resolve("projB/sym/inside_link").toString))
    assert(paths.contains(root.resolve("linktarget/inside_link").toString))
    // the root itself is never a row (A5)
    assert(!paths.contains(root.toString))
    // dirs appear as rows too (A5)
    assert(paths.contains(root.resolve("projA/sub").toString))
  }

  test("crawl end-to-end: stat fields, extension quirks, owner attribution") {
    val root = mkTree()
    val owners = mkOwners(root)
    val ctrs = Crawl.counters(spark)
    val df = Crawl.run(spark, Seq(root.toString),
      ownersFile = Some(owners.toString), ctrs = Some(ctrs))
    df.cache()
    val byPath = df.collect().map(r => r.getAs[String]("path") -> r).toMap

    val targz = byPath(root.resolve("projA/a.tar.gz").toString)
    // first dot in the 7-char tail window: '.tar.g' → 'tar.gz'
    assert(targz.getAs[String]("extension") == "tar.gz")
    assert(targz.getAs[Long]("st_size") == 5L) // "data1"
    assert(targz.getAs[String]("st_mode").length == 19)
    assert(targz.getAs[String]("owner") == "alice")

    // first-wins: projA stays alice even though carol lists it later
    val noext = byPath(root.resolve("projA/noext").toString)
    assert(noext.getAs[String]("owner") == "alice")

    // nearest ancestor wins: dir.d/inner → bob (not dan at projB)
    val inner = byPath(root.resolve("projB/dir.d/inner").toString)
    assert(inner.getAs[String]("owner") == "bob")

    // no ancestor in dim → null owner
    assert(byPath(root.resolve(".snapshot").toString).getAs[String]("owner") == null)

    // counters saw everything
    assert(ctrs.filesSeen.value + ctrs.dirsSeen.value == df.count())
    assert(ctrs.totalSize.value > 0)
    df.unpersist()
  }

  test("J1: UDF walk plan ≡ explode+join plan") {
    val root = mkTree()
    val owners = mkOwners(root)
    val a = Crawl.run(spark, Seq(root.toString), Some(owners.toString), useJoinPlan = false)
      .select("path", "owner")
    val b = Crawl.run(spark, Seq(root.toString), Some(owners.toString), useJoinPlan = true)
      .select("path", "owner")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("owners load: first-wins + skip-list") {
    val root = mkTree()
    val dim = Owners.load(spark, mkOwners(root).toString).collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(dim(root.resolve("projA").toString) == "alice")
    assert(!dim.contains("Nothing"))
    assert(dim(root.resolve("projB").toString) == "dan")
  }

  test("hostile filenames survive crawl and sink round-trip") {
    val root = mkTree()
    val df = Crawl.run(spark, Seq(root.toString))
    val paths = df.select("path").collect().map(_.getString(0)).toSet
    assert(paths.contains(root.resolve("projA/ünïcode fïle.txt").toString))
    assert(paths.contains(root.resolve("projA/sp ace's.dat").toString))
    val byPath = df.collect().map(r => r.getAs[String]("path") -> r).toMap
    assert(byPath(root.resolve("projA/sp ace's.dat").toString)
      .getAs[String]("extension") == "dat")
  }

  test("deep tree: V2 source and BFS agree at depth 50") {
    val root = Files.createTempDirectory(Paths.get("target"), "deeptree")
    var p = root
    (1 to 50).foreach { i =>
      p = p.resolve(s"d$i")
      Files.createDirectories(p)
    }
    Files.write(p.resolve("leaf.txt"), "x".getBytes)
    val bfs = crawl.StatEnricher.enrich(
      crawl.FsScanner.scan(spark, Seq(root.toString)))
      .collect().map(_.path).toSet
    val v2 = spark.read.format("graft.crawl.CrawlFsProvider")
      .option("roots", root.toString).load()
      .select("path").collect().map(_.getString(0)).toSet
    assert(bfs == v2)
    assert(bfs.size == 51) // 50 dirs + 1 leaf
    assert(bfs.contains(p.resolve("leaf.txt").toString))
  }

  test("crawl parquet sink roundtrip") {
    val root = mkTree()
    val df = Crawl.run(spark, Seq(root.toString))
    val out = Files.createTempDirectory(Paths.get("target"), "crawlsink").toString
    Crawl.writeParquet(df, out, "t1")
    val back = spark.read.parquet(s"$out/crawl_tag=t1")
    assert(back.count() == df.count())
    assert(back.columns.contains("st_mtime"))
  }
}
