package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.crawl.Crawl

/** S4 — the JDBC sink (the reference's primary sink,
  * storcrawl.py:314-417) exercised end-to-end against embedded Derby:
  * crawl a fixture tree, append via writeJdbc (batched, numPartitions =
  * the reference's --injects), read back through spark.read.jdbc and
  * compare row sets. */
class JdbcSinkSpec extends SparkSpec {

  test("writeJdbc round-trips crawl rows through a real database") {
    val root = new CrawlSpec().mkTree()
    val df = Crawl.run(spark, Seq(root.toString))
      .select("path", "extension", "st_size", "st_mtime") // stable subset
    val dbDir = Files.createTempDirectory(Paths.get("target"), "derby")
    val url = s"jdbc:derby:$dbDir/crawldb;create=true"

    Crawl.writeJdbc(df, url, "files", user = "app", password = "app",
      batchSize = 100, numPartitions = 4)

    val props = new java.util.Properties()
    props.setProperty("user", "app")
    props.setProperty("password", "app")
    val back = spark.read.jdbc(url, "files", props)
    assert(back.count() == df.count())
    val wantPaths = df.select("path").collect().map(_.getString(0)).toSet
    val gotPaths = back.select("path").collect().map(_.getString(0)).toSet
    assert(gotPaths == wantPaths)
    // append mode really appends (the reference commits incrementally)
    Crawl.writeJdbc(df, url, "files", user = "app", password = "app")
    assert(spark.read.jdbc(url, "files", props).count() == 2 * df.count())
  }
}
