package graft.crawl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, LinkOption, Path, Paths}
import java.nio.file.attribute.BasicFileAttributes

import scala.jdk.CollectionConverters._

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

  /** Byte-compare of an entry's basename against the exclusion list
    * (the reference byte-compares, storcrawl.py:66-67; a String compare
    * could false-match after lossy decode of a non-UTF-8 name). */
  private[crawl] def isExcluded(e: RawEntry, exclusions: Set[String]): Boolean =
    if (e.pathBytes.isEmpty) exclusions.contains(e.name)
    else {
      val nb = PathBytes.nameOf(e.pathBytes)
      exclusions.exists(x => java.util.Arrays.equals(x.getBytes(UTF_8), nb))
    }

  /** List one directory, reference-style: returns (entries, childDirs).
    * Any IO error yields an empty listing (log-and-continue).
    *
    * Listing goes through DirectoryStream, NOT File.listFiles: the
    * stream's UnixPath objects carry the raw readdir bytes, so entries
    * whose names are invalid in the JVM locale still stat correctly and
    * round-trip byte-exact ([[PathBytes]]); a File-based listing mangles
    * them to U+FFFD and then cannot stat the real file at all. One
    * NOFOLLOW readAttributes call yields both isDirectory and
    * isSymbolicLink (the File path needed two). */
  private[crawl] def listDirBytes(
      dir: Array[Byte],
      exclusions: Set[String]): (Seq[RawEntry], Seq[Array[Byte]]) = {
    val dirPath = PathBytes.toPath(dir)
    val listed: Seq[Path] =
      try {
        val ds = Files.newDirectoryStream(dirPath)
        try ds.asScala.toVector finally ds.close()
      } catch { case _: Exception => Vector.empty }
    val parentStr = dirPath.toString
    val entries = listed.map { p =>
      val (isDir, isLink) =
        try {
          val a = Files.readAttributes(
            p, classOf[BasicFileAttributes], LinkOption.NOFOLLOW_LINKS)
          (a.isDirectory, a.isSymbolicLink)
        } catch { case _: Exception => (false, false) }
      RawEntry(p.toString, parentStr, p.getFileName.toString, isDir, isLink,
        PathBytes.fromPath(p))
    }
    // descend: real dirs, not symlinks (storcrawl.py:465), not excluded
    val next = entries
      .filter(e => e.isDir && !e.isSymlink && !isExcluded(e, exclusions))
      .map(_.pathBytes)
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

    var frontier: Seq[Array[Byte]] =
      roots.map(r => PathBytes.fromPath(Paths.get(r)))
    var levels: List[Dataset[RawEntry]] = Nil
    while (frontier.nonEmpty) {
      val excl = exclusions // avoid closing over `this`
      val levelEntries = spark
        .createDataset(frontier)
        .repartition(math.min(parallelism, math.max(1, frontier.size)))
        .mapPartitions { dirs =>
          dirs.flatMap(d => listDirBytes(d, excl)._1)
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      // only child-dir paths come back to the driver (frontier metadata,
      // not data rows), as raw bytes so non-UTF-8 directory names
      // survive the driver round-trip
      frontier = levelEntries
        .filter(e => e.isDir && !e.isSymlink && !isExcluded(e, excl))
        .map(_.pathBytes)
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
