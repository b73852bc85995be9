package graft.crawl

import java.nio.file.{Files, LinkOption, Paths}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.Dataset

import graft.functions.Exprs

/** S2 — per-entry lstat enrichment (storcrawl.py:420-449).
  *
  * `mapPartitions` over entries calling `Files.readAttributes(path,
  * "unix:*", NOFOLLOW_LINKS)` — one syscall batch per file, no symlink
  * deref, matching `os.lstat`. Timestamps truncate to whole epoch
  * seconds like the reference's `int(float_epoch)` (storcrawl.py:368-370);
  * st_mode renders as the 19-char binary string (storcrawl.py:361).
  *
  * Divergence A3 (deliberate): a failed stat emits null stats plus an
  * `error` column instead of silently replaying the previous entry's
  * stat struct.
  *
  * Scale: stat calls are pure per-row work — linear scaling with
  * executors; the NFS/metadata server is the real-world ceiling, which
  * is why partition count (from the scanner) not operator design is the
  * tuning knob.
  */
object StatEnricher {

  private[crawl] def statOne(e: RawEntry): FileMeta = {
    try {
      // raw bytes when the scanner captured them: a Path rebuilt from
      // the (possibly lossily decoded) String cannot stat a file whose
      // name is invalid in the JVM locale
      val p = if (e.pathBytes.nonEmpty) PathBytes.toPath(e.pathBytes)
              else Paths.get(e.path)
      val attrs = Files.readAttributes(p, "unix:*", LinkOption.NOFOLLOW_LINKS)
      def l(k: String): Option[Long] = Option(attrs.get(k)).map {
        case n: java.lang.Number => n.longValue()
        case t: java.nio.file.attribute.FileTime => t.to(TimeUnit.SECONDS)
        case other => other.toString.toLong
      }
      val mode = l("mode").map(m => {
        val bits = java.lang.Long.toBinaryString(m & 0x7ffff)
        ("0" * (19 - bits.length)) + bits
      })
      FileMeta(
        path = e.path,
        extension = Option(Exprs.findExtensionScala(e.path)), // full path, like find_extension(item)
        st_mode = mode,
        st_ino = l("ino"),
        st_dev = l("dev").map(_.toString),
        st_nlink = l("nlink").map(_.toInt),
        st_uid = l("uid"),
        st_gid = l("gid"),
        st_size = l("size"),
        st_atime = Option(attrs.get("lastAccessTime"))
          .map(_.asInstanceOf[java.nio.file.attribute.FileTime].to(TimeUnit.SECONDS)),
        st_mtime = Option(attrs.get("lastModifiedTime"))
          .map(_.asInstanceOf[java.nio.file.attribute.FileTime].to(TimeUnit.SECONDS)),
        st_ctime = l("ctime"),
        owner = None,
        error = None)
    } catch {
      case ex: Exception =>
        FileMeta(e.path, Option(Exprs.findExtensionScala(e.path)),
          None, None, None, None, None, None, None, None, None, None,
          None, Some(ex.getClass.getSimpleName + ": " + ex.getMessage))
    }
  }

  def enrich(entries: Dataset[RawEntry]): Dataset[FileMeta] = {
    import entries.sparkSession.implicits._
    entries.mapPartitions(_.map(statOne))
  }
}
