package graft.crawl

import java.io.File
import java.nio.file.{Files, LinkOption, Paths}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** S1 — recursive directory scan (storcrawl.py:452-488) as an iterative
  * breadth-first frontier expansion.
  *
  * Reference semantics kept exactly:
  *  - every scandir entry (file, dir, symlink) is EMITTED downstream —
  *    including excluded dirs (A4: only descent is pruned,
  *    storcrawl.py:466-473);
  *  - descent prunes dirs whose basename equals an exclusion entry
  *    (default `.snapshot`, storcrawl.py:39,66-67);
  *  - symlinked dirs are not descended (`follow_symlinks=False`,
  *    storcrawl.py:465);
  *  - crawl roots themselves are never rows (A5: seeded into the queue
  *    only, storcrawl.py:578-580);
  *  - listing errors are logged-and-skipped (storcrawl.py:476-477).
  *
  * Scale design: each BFS level is one distributed `flatMap` over the
  * current frontier; only the (comparatively tiny) set of child
  * directory paths returns to the driver to seed the next level, and the
  * frontier is repartitioned each level so one huge directory fans out
  * across the cluster rather than pinning a single task. Entry rows
  * stay distributed (persisted per level, unioned lazily). On a 1000-
  * executor cluster the listing bottleneck is the deepest single
  * directory, not tree size — the same property the reference's shared
  * dir_queue gives its 4 walkers, minus the single-queue contention.
  */
object FsScanner {

  val DefaultExclusions: Set[String] = Set(".snapshot") // storcrawl.py:39

  /** List one directory, reference-style: returns (entries, childDirs).
    * Any IO error yields an empty listing (log-and-continue). */
  private[crawl] def listDir(
      dir: String,
      exclusions: Set[String]): (Seq[RawEntry], Seq[String]) = {
    val d = new File(dir)
    val children = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    val entries = children.map { f =>
      val p = f.toPath
      val isLink = Files.isSymbolicLink(p)
      val isDir = Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)
      RawEntry(f.getPath, dir, f.getName, isDir, isLink)
    }
    // descend: real dirs, not symlinks (storcrawl.py:465), not excluded
    val next = entries
      .filter(e => e.isDir && !e.isSymlink && !exclusions.contains(e.name))
      .map(_.path)
    (entries, next)
  }

  /** Crawl `roots` and return every directory entry below them. */
  def scan(
      spark: SparkSession,
      roots: Seq[String],
      exclusions: Set[String] = DefaultExclusions): Dataset[RawEntry] = {
    import spark.implicits._
    val sc = spark.sparkContext
    val parallelism = sc.defaultParallelism

    var frontier: Seq[String] = roots.map(r => Paths.get(r).toString)
    var levels: List[Dataset[RawEntry]] = Nil
    while (frontier.nonEmpty) {
      val excl = exclusions // avoid closing over `this`
      val levelEntries = spark
        .createDataset(frontier)
        .repartition(math.min(parallelism, math.max(1, frontier.size)))
        .mapPartitions { dirs =>
          dirs.flatMap(d => listDir(d, excl)._1)
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      // only child-dir paths come back to the driver (frontier metadata,
      // not data rows)
      frontier = levelEntries
        .filter(e => e.isDir && !e.isSymlink && !excl.contains(e.name))
        .map(_.path)
        .collect()
        .toSeq
      levels = levelEntries :: levels
    }
    levels match {
      case Nil => spark.emptyDataset[RawEntry]
      case head :: tail =>
        // consolidate the per-level caches into ONE persisted dataset and
        // release them — otherwise every scan pins one cached RDD per
        // tree level for the life of the session. Callers unpersist the
        // returned dataset when done.
        val all = tail.foldLeft(head)(_ unionAll _)
          .persist(StorageLevel.MEMORY_AND_DISK)
        all.count()
        levels.foreach(_.unpersist(blocking = false))
        all
    }
  }
}
