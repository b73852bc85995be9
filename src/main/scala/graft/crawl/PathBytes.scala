package graft.crawl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileSystems, Path, Paths}

/** Raw-byte access to POSIX paths (reference parity: the reference
  * stores paths as bytea and byte-compares exclusions —
  * storage_crawler/storcrawl.py:66-67,132-148,580).
  *
  * The JVM decodes readdir results into String through the startup
  * locale; bytes invalid in that charset become U+FFFD and the original
  * name is unrecoverable — worse, a Path rebuilt from that String
  * cannot stat the real file. java.nio's UnixPath, however, carries the
  * raw readdir bytes internally, so DirectoryStream Paths CAN stat any
  * file; this helper reaches those bytes (and rebuilds live Paths from
  * bytes) reflectively. Requires
  * `--add-opens java.base/sun.nio.fs=ALL-UNNAMED` (build.sbt sets it
  * for forked run/test JVMs); without it [[enabled]] is false and every
  * caller falls back to lossy UTF-8 strings — behavior identical to
  * the pre-byte-mode engine.
  */
object PathBytes {

  private val access = try {
    val cls = Class.forName("sun.nio.fs.UnixPath")
    val f = cls.getDeclaredField("path")
    f.setAccessible(true)
    val c = cls.getDeclaredConstructor(
      Class.forName("sun.nio.fs.UnixFileSystem"), classOf[Array[Byte]])
    c.setAccessible(true)
    // smoke-test the round trip before declaring the fast path live
    require(java.util.Arrays.equals(
      f.get(Paths.get("/tmp")).asInstanceOf[Array[Byte]], "/tmp".getBytes(UTF_8)))
    Some((cls, f, c))
  } catch { case _: Throwable => None }

  /** True when reflective byte access is live in this JVM. */
  val enabled: Boolean = access.isDefined

  /** The path's raw bytes (the exact readdir bytes when [[enabled]]). */
  def fromPath(p: Path): Array[Byte] = access match {
    case Some((cls, f, _)) if cls.isInstance(p) =>
      f.get(p).asInstanceOf[Array[Byte]]
    case _ => p.toString.getBytes(UTF_8)
  }

  /** A live Path for raw bytes — statable even when undecodable. */
  def toPath(bytes: Array[Byte]): Path = access match {
    case Some((_, _, c)) =>
      c.newInstance(FileSystems.getDefault, bytes).asInstanceOf[Path]
    case None => Paths.get(new String(bytes, UTF_8))
  }

  /** Final component of a byte path ('/' = 0x2f can never occur inside
    * a POSIX filename, whatever the encoding). */
  def nameOf(pathBytes: Array[Byte]): Array[Byte] = {
    val i = pathBytes.lastIndexOf('/'.toByte)
    if (i < 0) pathBytes else pathBytes.drop(i + 1)
  }

  /** dir bytes + '/' + name bytes. */
  def child(dirBytes: Array[Byte], nameBytes: Array[Byte]): Array[Byte] =
    if (dirBytes.nonEmpty && dirBytes.last == '/'.toByte) dirBytes ++ nameBytes
    else (dirBytes :+ '/'.toByte) ++ nameBytes
}
