package graft

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

  test("V2 source: column pruning-friendly narrow select works") {
    val root = new CrawlSpec().mkTree()
    val exts = read(root.toString)
      .filter(col("is_dir") === false)
      .select("extension").collect().flatMap(r => Option(r.getString(0)))
    assert(exts.contains("tar.gz"))
  }
}
