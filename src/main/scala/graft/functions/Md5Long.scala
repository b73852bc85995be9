package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The house 60-bit md5 hash, computed straight from the digest bytes.
  *
  * Semantically IDENTICAL to the legacy spelling
  * `conv(substring(md5(c), 1, 15), 16, 10)`: the first 15 hex chars of
  * an md5 are the first 15 nibbles of the digest, i.e. the big-endian
  * first 8 bytes shifted right one nibble — always in [0, 2^60), so
  * the base-16 parse is exact and non-negative. The legacy form paid,
  * per call: a 32-char hex encode (UTF8String alloc), a substring
  * copy, and `conv`'s character-by-character base-16 parse — pure
  * overhead around the actual digest, and this hash runs per WORD or
  * per GRAM in a dozen corpus queries (r16, guide "per-task work").
  * This expression digests and assembles the long with zero string
  * materialization; the oracle's spelling
  * (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`) is unchanged and the
  * 305-query hash gate pins the equivalence.
  */
object Md5Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Reusable 16-byte digest output buffer: `MessageDigest.digest()`
    * allocates its result array per call, which matters on the
    * per-character-position call sites (r17; VERDICT-r16 #4). */
  private val outBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** 60 bits of md5(bytes) as a non-negative long. half = 0 reads hex
    * chars [1,15] (nibbles 0-14 = bytes 0-7 >>> 4); half = 1 reads hex
    * chars [17,31] (nibbles 16-30 = bytes 8-15 >>> 4) — the two
    * substring windows the draw-style call sites use. */
  def long60(bytes: Array[Byte], half: Int): Long =
    long60(bytes, 0, bytes.length, half)

  /** Slice variant with a reusable output buffer: digests
    * `bytes[off, off+len)` with zero allocation per call — the inner
    * loop of [[CdcBoundsExpr]], which digests every 4-char window of a
    * document. */
  def long60(bytes: Array[Byte], off: Int, len: Int, half: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    val dg = outBuf.get()
    d.digest(dg, 0, 16)
    val dgOff = half * 8
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dg(dgOff + i) & 0xffL); i += 1 }
    v >>> 4
  }

  def long60(bytes: Array[Byte]): Long = long60(bytes, 0)

  def long60(s: UTF8String): Long = long60(s.getBytes, 0)

  def long60(s: UTF8String, half: Int): Long = long60(s.getBytes, half)
}

/** `graft_md5_long60(c)` — see [[Md5Util]]. Accepts STRING or BINARY
  * (matching `md5()`'s implicit-cast surface). Codegen'd as one static
  * call. `half` selects which 60-bit digest window to read: 0 = hex
  * chars [1,15] (the house hash), 1 = hex chars [17,31] (the second
  * draw window q_bootstrap_ci's Poisson weights consume). */
case class Md5Long60Expr(child: Expression, half: Int = 0)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_md5_long60 takes STRING or BINARY, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  private def isString = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any =
    if (isString) Md5Util.long60(input.asInstanceOf[UTF8String], half)
    else Md5Util.long60(input.asInstanceOf[Array[Byte]], half)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Util.long60($c, $half);")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_long60"
}
