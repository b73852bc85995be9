package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.crawl._

/** The DataSource V2 crawl source agrees with the BFS pipeline and
  * keeps the reference semantics. */
class CrawlFsSourceSpec extends SparkSpec {

  private def read(root: String, targetParts: Int = 4) =
    spark.read.format("graft.crawl.CrawlFsProvider")
      .option("roots", root)
      .option("targetPartitions", targetParts.toString)
      .load()

  test("V2 source emits exactly the BFS scanner's entries with stats") {
    val root = new CrawlSpec().mkTree()
    val v2 = read(root.toString)
      .select("path", "st_size").collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    val bfs = StatEnricher.enrich(FsScanner.scan(spark, Seq(root.toString)))
      .collect().map(m => m.path -> m.st_size.map(Long.box).orNull).toMap
    assert(v2.keySet == bfs.keySet)
    bfs.foreach { case (p, sz) => assert(v2(p) == sz, s"size mismatch at $p") }
  }

  test("V2 source: exclusion recorded-not-descended, symlink not descended") {
    val root = new CrawlSpec().mkTree()
    val paths = read(root.toString).select("path").collect().map(_.getString(0)).toSet
    assert(paths.contains(root.resolve(".snapshot").toString))
    assert(!paths.contains(root.resolve(".snapshot/hidden_file").toString))
    assert(!paths.contains(root.resolve("projB/sym/inside_link").toString))
    assert(!paths.contains(root.toString)) // roots are not rows
  }

  test("V2 source: planning produces multiple partitions for fan-out") {
    val root = new CrawlSpec().mkTree()
    val df = read(root.toString, targetParts = 2)
    assert(df.rdd.getNumPartitions >= 2)
    // and the union over partitions is still exactly-once
    val n = df.count()
    assert(df.select("path").distinct().count() == n)
  }

  test("adaptive planning: a 90%-hot directory spreads instead of pinning one task") {
    // one directory holds ~90% of the files (10 subdirs × 90 files);
    // 16 small siblings hold the rest — the shape of every real
    // filesystem's giant project dir
    val root = Files.createTempDirectory(Paths.get("target"), "hottree")
    (0 until 10).foreach { s =>
      val d = root.resolve("big").resolve(s"sub$s")
      Files.createDirectories(d)
      (0 until 90).foreach(i => Files.write(d.resolve(s"f$i"), Array[Byte]('x')))
    }
    (0 until 16).foreach { s =>
      val d = root.resolve(s"small$s")
      Files.createDirectories(d)
      (0 until 6).foreach(i => Files.write(d.resolve(s"f$i"), Array[Byte]('x')))
    }
    // small loose budget forces subtree partitions (the scale regime);
    // ratio = max partition entry-count over mean
    def ratio(overSub: Int): Double = {
      val counts = spark.read.format("graft.crawl.CrawlFsProvider")
        .option("roots", root.toString)
        .option("targetPartitions", "8")
        .option("maxLooseEntries", "100")
        .option("oversubscribe", overSub.toString)
        .load()
        .groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1))
      counts.max.toDouble / (counts.sum.toDouble / counts.length)
    }
    // static packing (no oversubscription) pins the hot subtree: ~n× skew
    assert(ratio(1) > 4.0, "fixture too tame: static packing should skew")
    // oversubscribed planning keeps partitions within the 4× bound
    assert(ratio(CrawlFsSource.DefaultOversubscribe) <= 4.0)
  }

  test("V2 source: column pruning-friendly narrow select works") {
    val root = new CrawlSpec().mkTree()
    val exts = read(root.toString)
      .filter(col("is_dir") === false)
      .select("extension").collect().flatMap(r => Option(r.getString(0)))
    assert(exts.contains("tar.gz"))
  }
}
