package graft

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger

/** The crawl as a Structured Streaming source: initial snapshot batch,
  * then incremental batches of exactly the entries whose mtime entered
  * the new offset window — across a checkpoint-recovered restart.
  */
class StreamingCrawlSpec extends SparkSpec {

  private def runPhase(root: Path, ckpt: Path): Set[String] = {
    val seen = mutable.Set.empty[String]
    val df = spark.readStream.format("graft.crawl.CrawlFsProvider")
      .option("roots", root.toString)
      .option("watermarkLagSec", "0") // test fs+clock are the same host
      .load()
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("path").collect().map(_.getString(0))
        seen.synchronized { seen ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    seen.toSet
  }

  test("snapshot batch, then incremental mtime-window batches across restarts") {
    val root = Files.createTempDirectory("graft-stream-crawl")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    Files.write(root.resolve("a.txt"), "one".getBytes)
    Files.write(root.resolve("b.txt"), "two".getBytes)
    Files.createDirectory(root.resolve("c"))
    Files.write(root.resolve("c/d.txt"), "three".getBytes)
    Thread.sleep(1100) // mtimes are whole seconds; cross the boundary

    val phase1 = runPhase(root, ckpt)
    assert(phase1 === Set(
      root.resolve("a.txt"), root.resolve("b.txt"),
      root.resolve("c"), root.resolve("c/d.txt")).map(_.toString),
      "snapshot batch emits every entry (root itself is never a row)")

    Thread.sleep(1100)
    Files.write(root.resolve("c/e.txt"), "new".getBytes)    // added
    Files.write(root.resolve("a.txt"), "rewritten".getBytes) // modified
    Thread.sleep(1100)

    val phase2 = runPhase(root, ckpt)
    // c's own mtime changed too (a child landed in it)
    assert(phase2 === Set(
      root.resolve("c/e.txt"), root.resolve("a.txt"), root.resolve("c"))
      .map(_.toString),
      s"incremental batch emits exactly the touched entries, got $phase2")

    val phase3 = runPhase(root, ckpt)
    assert(phase3 === Set.empty[String], "no changes → empty batch")

    // an addition with a PRESERVED old mtime (cp -p / tar -x / rsync -a
    // shape): mtime predates every window, but the kernel-stamped ctime
    // is now — the max(mtime, ctime) window must still emit it
    Thread.sleep(1100)
    val preserved = root.resolve("c/old-mtime.txt")
    Files.write(preserved, "extracted".getBytes)
    Files.setLastModifiedTime(preserved,
      java.nio.file.attribute.FileTime.fromMillis(946684800000L)) // 2000-01-01
    Thread.sleep(1100)
    val phase4 = runPhase(root, ckpt)
    assert(phase4.contains(preserved.toString),
      s"back-dated addition must surface via ctime, got $phase4")
  }

  test("streamToParquet --once: snapshot, then delta appends across restarts") {
    val root = Files.createTempDirectory("graft-stream-pq")
    val out = Files.createTempDirectory("graft-stream-pq-out").toString
    Files.write(root.resolve("a.txt"), "one".getBytes)
    val owners = root.resolve("owners.txt")
    Files.write(owners, s"alice=$root\n".getBytes)
    Thread.sleep(1100)
    def drain(): Map[String, String] = {
      val q = graft.crawl.Crawl.streamToParquet(
        spark, Seq(root.toString), Set(".snapshot"), out, "t1",
        once = true, watermarkLagSec = 0, ownersFile = Some(owners.toString))
      q.awaitTermination()
      spark.read.parquet(s"$out/crawl_stream_tag=t1")
        .select("path", "owner").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    }
    val first = drain()
    assert(first.keySet === Set(root.resolve("a.txt"), owners).map(_.toString))
    assert(first(root.resolve("a.txt").toString) === "alice",
      "streaming owner attribution via the broadcast UDF walk")
    Thread.sleep(1100)
    Files.write(root.resolve("b.txt"), "two".getBytes)
    Thread.sleep(1100)
    val after = drain()
    assert(after.keySet ===
      Set(root.resolve("a.txt"), root.resolve("b.txt"), owners).map(_.toString),
      s"delta batch appends only the new entry, got ${after.keySet}")
    assert(after(root.resolve("b.txt").toString) === "alice")
  }
}
