package graft.crawl

import java.io.{ByteArrayOutputStream, IOException}
import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets.UTF_8

/** Error raised for any PostgreSQL `ErrorResponse` or protocol
  * violation; carries the server's SEVERITY/CODE/MESSAGE fields. */
final class PgWireException(msg: String) extends IOException(msg)

/** Result of one simple-query round trip: text-format rows (None =
  * SQL NULL) plus the CommandComplete tag (`"INSERT 0 1"`, `"COPY 42"`,
  * `"BEGIN"`, …). */
final case class PgResult(rows: Vector[Vector[Option[String]]], tag: String)

/** Minimal PostgreSQL v3 frontend over a Unix-domain socket — just
  * enough of the PUBLIC wire protocol (PostgreSQL docs, "Frontend/
  * Backend Protocol") to drive the reference's live database sink
  * (storcrawl.py:314-417) from Spark executors when no JDBC driver jar
  * is available: startup + trust auth, the simple-query subprotocol,
  * and `COPY … FROM STDIN` in text format.
  *
  * Scope is deliberately tiny and synchronous: one connection per
  * executor partition, text-format results only, trust/local auth only
  * (the throwaway cluster the tests boot; a real deployment would drop
  * in the standard `org.postgresql` driver and use
  * [[Crawl.writeJdbc]] — this class exists so the live write leg is
  * provable in a zero-egress sandbox and as the COPY fast path, which
  * the JDBC driver's row-at-a-time batching cannot match).
  *
  * Thread-compatible, not thread-safe: each connection belongs to the
  * partition task that opened it.
  */
final class PgWireClient private (ch: SocketChannel) extends AutoCloseable {

  // ---- framing -----------------------------------------------------

  private def writeAll(buf: ByteBuffer): Unit =
    while (buf.hasRemaining) ch.write(buf)

  private def send(msgType: Byte, payload: Array[Byte]): Unit = {
    val buf = ByteBuffer.allocate(1 + 4 + payload.length)
    buf.put(msgType).putInt(payload.length + 4).put(payload)
    buf.flip()
    writeAll(buf)
  }

  private def readFully(n: Int): ByteBuffer = {
    val buf = ByteBuffer.allocate(n)
    while (buf.hasRemaining)
      if (ch.read(buf) < 0)
        throw new PgWireException("connection closed mid-message")
    buf.flip()
    buf
  }

  /** One backend message: (type byte, payload). */
  private def readMessage(): (Byte, ByteBuffer) = {
    val head = readFully(5)
    val t = head.get()
    val len = head.getInt() - 4
    if (len < 0 || len > (1 << 30))
      throw new PgWireException(s"implausible message length $len (type ${t.toChar})")
    (t, readFully(len))
  }

  private def cstr(b: ByteBuffer): String = {
    val out = new ByteArrayOutputStream()
    var c = b.get()
    while (c != 0) { out.write(c.toInt); c = b.get() }
    new String(out.toByteArray, UTF_8)
  }

  private def errorText(b: ByteBuffer): String = {
    val sb = new StringBuilder
    var f = b.get()
    while (f != 0) {
      sb.append(f.toChar).append('=').append(cstr(b)).append("; ")
      f = b.get()
    }
    sb.result()
  }

  // ---- handshake ---------------------------------------------------

  private[crawl] def startup(user: String, database: String): Unit = {
    val body = new ByteArrayOutputStream()
    def z(s: String): Unit = { body.write(s.getBytes(UTF_8)); body.write(0) }
    z("user"); z(user)
    z("database"); z(database)
    body.write(0)
    val payload = body.toByteArray
    val buf = ByteBuffer.allocate(4 + 4 + payload.length)
    buf.putInt(4 + 4 + payload.length).putInt(196608 /* v3.0 */).put(payload)
    buf.flip()
    writeAll(buf)
    var ready = false
    while (!ready) readMessage() match {
      case ('R', b) =>
        val code = b.getInt()
        if (code != 0)
          throw new PgWireException(
            s"server requested auth method $code; only trust (0) is supported")
      case ('S', _) | ('K', _) | ('N', _) => // ParameterStatus/KeyData/Notice
      case ('E', b) => throw new PgWireException(s"startup failed: ${errorText(b)}")
      case ('Z', _) => ready = true
      case (t, _)   => throw new PgWireException(s"unexpected startup message '${t.toChar}'")
    }
  }

  // ---- simple query ------------------------------------------------

  /** Run one statement through the simple-query subprotocol; text-format
    * rows back. Throws [[PgWireException]] on any server error (after
    * draining to ReadyForQuery, so the connection stays usable). */
  def query(sql: String): PgResult = {
    val b = sql.getBytes(UTF_8)
    send('Q'.toByte, b :+ 0.toByte)
    var rows = Vector.newBuilder[Vector[Option[String]]]
    var tag = ""
    var err: String = null
    var done = false
    while (!done) readMessage() match {
      case ('T', _) => // RowDescription: text results don't need field detail
      case ('D', d) =>
        val n = d.getShort().toInt
        rows += Vector.tabulate(n) { _ =>
          val len = d.getInt()
          if (len < 0) None
          else {
            val a = new Array[Byte](len)
            d.get(a)
            Some(new String(a, UTF_8))
          }
        }
      case ('C', c) => tag = cstr(c)
      case ('I', _) => // EmptyQueryResponse
      case ('S', _) | ('N', _) => // ParameterStatus (SET), Notice
      case ('E', e) => err = errorText(e)
      case ('Z', _) => done = true
      case (t, _) =>
        err = s"unexpected message '${t.toChar}' during simple query"
    }
    if (err != null) throw new PgWireException(s"query failed: $err\nSQL: $sql")
    PgResult(rows.result(), tag)
  }

  /** `COPY … FROM STDIN` (text format): streams `lines` (WITHOUT
    * trailing newline; already COPY-escaped — see [[PgCopyText]]) and
    * returns the row count from the `COPY n` tag. Lines are coalesced
    * into ~64 KiB CopyData messages — per-row messages would syscall
    * per row. */
  def copyIn(sql: String, lines: Iterator[String]): Long = {
    val b = sql.getBytes(UTF_8)
    send('Q'.toByte, b :+ 0.toByte)
    var inCopy = false
    while (!inCopy) readMessage() match {
      case ('G', _)            => inCopy = true // CopyInResponse
      case ('S', _) | ('N', _) =>
      case ('E', e) =>
        drainToReady()
        throw new PgWireException(s"COPY rejected: ${errorText(e)}\nSQL: $sql")
      case (t, _) =>
        throw new PgWireException(s"unexpected message '${t.toChar}' awaiting CopyInResponse")
    }
    val chunk = new ByteArrayOutputStream(1 << 16)
    def flush(): Unit = if (chunk.size() > 0) {
      send('d'.toByte, chunk.toByteArray)
      chunk.reset()
    }
    while (lines.hasNext) {
      chunk.write(lines.next().getBytes(UTF_8))
      chunk.write('\n')
      if (chunk.size() >= (1 << 16)) flush()
    }
    flush()
    send('c'.toByte, Array.emptyByteArray) // CopyDone
    var tag = ""
    var err: String = null
    var done = false
    while (!done) readMessage() match {
      case ('C', c)            => tag = cstr(c)
      case ('S', _) | ('N', _) =>
      case ('E', e)            => err = errorText(e)
      case ('Z', _)            => done = true
      case (t, _)              => err = s"unexpected message '${t.toChar}' after CopyDone"
    }
    if (err != null) throw new PgWireException(s"COPY failed: $err\nSQL: $sql")
    tag.split(' ') match {
      case Array("COPY", n) => n.toLong
      case _ => throw new PgWireException(s"unexpected COPY tag '$tag'")
    }
  }

  private def drainToReady(): Unit = {
    var done = false
    while (!done) readMessage() match {
      case ('Z', _) => done = true
      case _        =>
    }
  }

  override def close(): Unit = {
    try send('X'.toByte, Array.emptyByteArray) // Terminate
    catch { case _: IOException => }
    ch.close()
  }
}

object PgWireClient {

  /** Connect over the cluster's Unix socket (`$socketDir/.s.PGSQL.$port`)
    * and complete the trust-auth startup. Java 17's native
    * unix-domain SocketChannel — no JNI, no driver jar. */
  def connect(socketDir: String, port: Int, user: String,
      database: String): PgWireClient = {
    val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    ch.connect(UnixDomainSocketAddress.of(s"$socketDir/.s.PGSQL.$port"))
    val c = new PgWireClient(ch)
    try c.startup(user, database)
    catch { case e: Throwable => ch.close(); throw e }
    c
  }
}

/** COPY text-format field encoding (PostgreSQL docs, "COPY", text
  * format): `\t` separates fields, `\N` is NULL, and backslash, tab,
  * newline and carriage return in data must be backslash-escaped.
  * `bytea` fields carry the hex input form `\xDEADBEEF`, whose leading
  * backslash itself needs COPY escaping → `\\x…` on the wire. */
object PgCopyText {

  val Null = "\\N"

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.result()
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  def bytea(b: Array[Byte]): String = {
    val sb = new StringBuilder(4 + b.length * 2)
    sb.append("\\\\x") // "\\x" after COPY unescaping → bytea hex form
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      sb.append(HexDigits(v >> 4)).append(HexDigits(v & 0xf))
      i += 1
    }
    sb.result()
  }

  /** One COPY text line from already-stringified field values. */
  def line(fields: Seq[String]): String = fields.mkString("\t")
}
