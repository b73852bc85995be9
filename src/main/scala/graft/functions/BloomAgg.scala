package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit math shared by the aggregate's update path and the codegen'd
  * membership probe. Double hashing over the caller-supplied 64-bit
  * hash (Kirsch–Mitzenmacher): split into two 32-bit halves h1/h2 and
  * probe bit (h1 + i·h2) mod m for i = 1..k. The aggregate never sees
  * raw values — callers feed `xxhash64(col)` (or any 64-bit hash), so
  * the filter works for any input type without a hash family of its
  * own, and the oracle never needs to reproduce the bloom: it is a
  * PREFILTER with zero false negatives, the exact verify step owns
  * correctness.
  */
object BloomUtil {

  /** Bit index of probe `i` for hash `h` in an `m`-bit filter. */
  def bitIndex(h: Long, i: Int, m: Int): Int = {
    val h1 = h.toInt
    val h2 = (h >>> 32).toInt
    var c = h1 + i * h2
    if (c < 0) c = ~c
    c % m
  }

  def set(words: Array[Long], h: Long, k: Int): Unit = {
    val m = words.length * 64
    var i = 1
    while (i <= k) {
      val b = bitIndex(h, i, m)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  /** Static probe target for both interpreted eval and doGenCode. The
    * serialized layout is a header-free big-endian word array. */
  def mightContain(bytes: Array[Byte], h: Long, k: Int): Boolean = {
    val m = bytes.length * 8
    var i = 1
    while (i <= k) {
      val b = bitIndex(h, i, m)
      val byte = bytes(b >>> 3)
      if (((byte >>> (b & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    // little-endian within the word so byte (b>>>3) / bit (b&7) probing
    // agrees with word (b>>>6) / bit (b&63) setting
    val out = new Array[Byte](words.length * 8)
    var w = 0
    while (w < words.length) {
      var j = 0
      while (j < 8) {
        out(w * 8 + j) = ((words(w) >>> (8 * j)) & 0xffL).toByte
        j += 1
      }
      w += 1
    }
    out
  }
}

/** `bloom_agg(hash64, numBits, numHashes)` — mergeable Bloom filter
  * over pre-hashed BIGINT inputs; returns the filter as BINARY.
  *
  * The scale role: a broadcastable set-membership summary when the set
  * itself is too large to broadcast as an exact hash relation. A
  * 100 M-gram eval suite is gigabytes of strings but ~100 MB of bloom
  * at 8 bits/key — the corpus-side scan probes the bloom map-side
  * (codegen'd [[BloomContainsExpr]]) and only the matched sliver
  * reaches the exact verify join's shuffle. False positives cost only
  * wasted verify work; false negatives are impossible, so exactness is
  * preserved end to end.
  *
  * A [[TypedImperativeAggregate]] (object buffer = the word array):
  * partial filters OR-merge, so map-side combine ships one fixed-size
  * filter per partition regardless of input rows.
  */
case class BloomLongsAgg(
    child: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  @transient private lazy val numBits: Int = {
    val m = numBitsExpr.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"bloom_agg numBits: $other")
    }
    // round up to a whole word so bytes/words probing agree
    ((m + 63) / 64) * 64
  }

  @transient private lazy val numHashes: Int = numHashesExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"bloom_agg numHashes: $other")
  }

  override def children: Seq[Expression] = Seq(child, numBitsExpr, numHashesExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg hash must be BIGINT, got ${child.dataType.simpleString}")
    else if (!numBitsExpr.foldable || !numHashesExpr.foldable)
      TypeCheckResult.TypeCheckFailure("bloom_agg numBits/numHashes must be literals")
    else {
      val m = numBitsExpr.eval(InternalRow.empty)
      val k = numHashesExpr.eval(InternalRow.empty)
      (m, k) match {
        case (null, _) | (_, null) =>
          TypeCheckResult.TypeCheckFailure("bloom_agg numBits/numHashes must not be NULL")
        case (mi: Int, ki: Int) if mi >= 64 && mi <= (1 << 30) && ki >= 1 && ki <= 16 =>
          TypeCheckResult.TypeCheckSuccess
        case _ =>
          TypeCheckResult.TypeCheckFailure(
            s"bloom_agg requires 64 <= numBits <= 2^30 and 1 <= numHashes <= 16, got ($m, $k)")
      }
    }
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomUtil.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomLongsAgg =
    copy(child = newChildren(0), numBitsExpr = newChildren(1), numHashesExpr = newChildren(2))

  override def prettyName: String = "bloom_agg"
}

/** `bloom_contains(filter, hash64, numHashes)` — membership probe
  * against a [[BloomLongsAgg]] filter. Codegen'd (a static call into
  * [[BloomUtil]]) so the corpus-side prefilter stays inside
  * whole-stage codegen; numHashes must match the build side's.
  */
case class BloomContainsExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains filter must be BINARY, got ${first.dataType.simpleString}")
    else if (second.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains hash must be BIGINT, got ${second.dataType.simpleString}")
    else if (!third.foldable || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("bloom_contains numHashes must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(b: Any, h: Any, k: Any): Any =
    BloomUtil.mightContain(
      b.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h, k) =>
      s"${ev.value} = graft.functions.BloomUtil.mightContain($b, $h, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomContainsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bloom_contains"
}

/** Membership probe against a filter shipped as a BROADCAST VARIABLE
  * instead of a foldable Literal (ADVICE r16): a Literal filter lives
  * in the plan's reference objects, which serialize into EVERY task
  * binary — fine for the KB-scale filters the bench builds, ~128 MB
  * per task at the aggregate's 2^30-bit cap on a real cluster. This
  * variant serializes only the broadcast HANDLE with the task; the
  * bytes ship once per executor via the broadcast machinery. Same
  * probe semantics as [[BloomContainsExpr]] (one shared
  * [[BloomUtil.mightContain]]); codegen fetches the bytes once into
  * per-plan mutable state, zero per-row copies either way.
  */
case class BloomContainsBcastExpr(
    bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression, numHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains_bcast hash must be BIGINT, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(h: Any): Any =
    BloomUtil.mightContain(bcast.value, h.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBcast", bcast,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val bytes = ctx.addMutableState("byte[]", "bloomBcastBytes",
      v => s"$v = (byte[]) $bRef.value();")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.BloomUtil.mightContain($bytes, $h, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsBcastExpr =
    copy(child = newChild)

  override def prettyName: String = "bloom_contains_bcast"
}
