package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All sign-random-projection band signatures of one embedding in a
  * single expression: ARRAY<STRUCT<band:INT, key:LONG,
  * flipbits:ARRAY<LONG>>> with one entry per band.
  *
  * Why this exists: building the same result from per-projection
  * columns needs bands×bits [[FloatDotExpr]] nodes in ONE Project —
  * at corpus-sized parameters (StressSpec: 20k vectors → 12 bits × 12
  * bands = 144 dots over 64-dim literals) the generated
  * `doConsume` method exceeds the JVM's 64 KB limit, janino refuses,
  * and the whole stage silently falls back to interpreted Catalyst
  * eval — per-node dispatch on the hottest loop of the pipeline,
  * exactly at the scale where it matters. This node keeps whole-stage
  * codegen intact (the generated call is one line) and runs the math
  * as tight JVM loops over a flat primitive plane matrix.
  *
  * Bit-compatibility with the column construction it replaces, per
  * projection proj = Σᵢ (double)(emb[i]·plane[i]) in index order
  * (float multiply, double accumulate — [[FloatDotExpr]] semantics,
  * null elements skipped):
  *   - key sets bit b iff proj_b >= 0 (NaN sets nothing);
  *   - flipbits = the `multiprobe` lowest-|proj| bit masks, ties by
  *     ascending bit, NaN margins last (java.lang.Double.compare —
  *     the same total order Catalyst's array_sort applies);
  *   - a vector of the wrong length keys to 0 in every band with
  *     flipbits [1,2,4,…] (what NULL projections produced before).
  * One deliberate divergence: a NULL embedding yields NULL (no band
  * rows after explode) instead of the old construction's key-0 rows —
  * a null vector must never become a near-dup candidate.
  */
case class SignBandsExpr(
    child: Expression,
    planes: IndexedSeq[Float],
    bands: Int,
    bits: Int,
    multiprobe: Int)
  extends UnaryExpression {

  require(bands >= 1 && bits >= 1 && bits <= 62 && multiprobe >= 0)
  require(planes.length % (bands * bits) == 0 && planes.nonEmpty,
    s"planes length ${planes.length} not divisible by bands*bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("key", LongType, nullable = false),
      StructField("flipbits", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)

  override def prettyName: String = "sign_bands"

  override protected def withNewChildInternal(newChild: Expression): SignBandsExpr =
    copy(child = newChild)

  @transient private lazy val planeArr: Array[Float] = planes.toArray
  @transient private lazy val dim: Int = planeArr.length / (bands * bits)
  @transient private lazy val probeCount: Int = math.min(multiprobe, bits)

  /** Flip set for malformed vectors: all margins NULL → the old
    * array_sort put null-margin structs first, ordered by bit. */
  @transient private lazy val nullFlips: Array[Long] =
    Array.tabulate(probeCount)(i => 1L << i)

  def compute(emb: ArrayData): ArrayData = {
    val out = new Array[Any](bands)
    if (emb.numElements() != dim) {
      var l = 0
      while (l < bands) {
        out(l) = InternalRow(l, 0L, new GenericArrayData(nullFlips))
        l += 1
      }
      return new GenericArrayData(out)
    }
    // materialize once: ArrayData.getFloat on UnsafeArrayData is cheap
    // but a flat primitive array keeps the inner loop vectorizable
    val v = new Array[Float](dim)
    val skip = new Array[Boolean](dim)
    var i = 0
    while (i < dim) {
      if (emb.isNullAt(i)) skip(i) = true else v(i) = emb.getFloat(i)
      i += 1
    }
    val margins = new Array[Double](bits)
    val order = new Array[Integer](bits)
    var off = 0
    var l = 0
    while (l < bands) {
      var key = 0L
      var b = 0
      while (b < bits) {
        var sum = 0.0d
        var j = 0
        while (j < dim) {
          if (!skip(j)) sum += (v(j) * planeArr(off + j)).toDouble
          j += 1
        }
        if (sum >= 0d) key |= 1L << b
        margins(b) = math.abs(sum)
        b += 1
        off += dim
      }
      val flips: Array[Long] =
        if (probeCount == 0) Array.emptyLongArray
        else {
          var k = 0
          while (k < bits) { order(k) = Integer.valueOf(k); k += 1 }
          java.util.Arrays.sort(order, (x: Integer, y: Integer) => {
            val c = java.lang.Double.compare(margins(x), margins(y))
            if (c != 0) c else Integer.compare(x, y)
          })
          Array.tabulate(probeCount)(k => 1L << order(k))
        }
      out(l) = InternalRow(l, key, new GenericArrayData(flips))
      l += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one generated line calling into this instance: the surrounding
    // stage keeps whole-stage codegen (no 64 KB blowup however large
    // bands×bits grows); the loops themselves are already tight JVM code
    val ref = ctx.addReferenceObj("signBands", this, classOf[SignBandsExpr].getName)
    nullSafeCodeGen(ctx, ev, emb => s"${ev.value} = $ref.compute($emb);")
  }
}
