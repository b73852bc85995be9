package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Scalar expression library for the engine.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so the
  * whole surface stays inside whole-stage codegen; the only UDF is the
  * byte-faithful [[findExtensionUdf]] port (reference
  * storage_crawler/storcrawl.py:259-268), kept for quirk-fidelity tests —
  * production plans use the codegen'd [[findExtension]] column instead.
  *
  * Cross-engine determinism rules (SURVEY.md §4.3/§7.3) are encoded as
  * helpers: decimal casts before arithmetic on doubles, epoch-second
  * BIGINT projections instead of raw timestamps, and a shared md5-based
  * 60-bit hash that DuckDB can reproduce exactly
  * (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`).
  */
object Exprs {

  /** Exact 2-dp decimal view of a double column (cast BEFORE any
    * multiply/sum so rounding-mode differences between engines can't
    * surface: HALF_UP vs HALF_EVEN only diverge on exact .xx5 values,
    * which a direct 2-dp cast of a ~2-dp double never produces). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a double column as DECIMAL(18,2): element-wise cast,
    * exact decimal summation (order-independent), fixed output scale. */
  def decSum2(c: Column): Column = sum(dec2(c)).cast(DecimalType(18, 2))

  /** AVG with deterministic cross-engine semantics: exact decimal sum
    * divided by count, pinned to scale 6 (reference AVG(value):
    * report.py:139-145). */
  def decAvg6(c: Column): Column =
    (sum(dec2(c)) / count(c)).cast(DecimalType(18, 6))

  /** Integer-scaled BIGINT projection of an exact decimal — the ONLY
    * sanctioned way to emit a decimal quantity from a final SELECT.
    * Decimal output representations are canonicalized differently by
    * downstream readers (DuckDB HUGEINT → arrow decimal128, decimal →
    * double 1-ulp double-rounding), so DECIMAL columns hash-mismatch
    * even when cell values are identical; an integer < 2^53 is
    * representation-proof. `factor` must be 10^scale of the decimal so
    * the product is an exact integer. */
  def intScaled(c: Column, factor: Long): Column =
    (c * factor).cast(LongType)

  /** Epoch seconds (BIGINT) of a timestamp / timestamp_ntz column;
    * truncating like the reference's int(float_epoch)
    * (storcrawl.py:368-370). NTZ is interpreted in the session TZ (UTC). */
  def epochSec(c: Column): Column = c.cast("timestamp").cast(LongType)

  /** Epoch seconds from the raw nanosecond Long of `events.ts`
    * (Tables.events normalizes any physical ts type to epoch-nanos
    * Long — see its scaladoc). Exact
    * integral division — NOT double division, which loses precision
    * above 2^53 (epoch-nanos ≈ 1.7e18) and could floor to the wrong
    * second near boundaries. */
  def nanosToSec(c: Column): Column =
    floor(c.cast(DecimalType(28, 0)) / lit(1000000000L)).cast(LongType)

  /** Deterministic 60-bit positive hash shared with DuckDB:
    * first 15 hex chars of md5, parsed base-16. Used as the hash family
    * for minhash / simhash / fingerprints so the oracle can reproduce
    * signatures bit-for-bit. Computed by [[Md5Long60Expr]] straight
    * from the digest bytes (r16) — value-identical to the legacy
    * `conv(substring(md5(c),1,15),16,10)` spelling without the hex
    * encode / substring / base-16 string parse per call. */
  def md5Long(c: Column): Column = md5LongHalf(c, 0)

  /** The second 60-bit digest window (hex chars [17,31]) — the extra
    * draw bits q_bootstrap_ci consumes; value-identical to the legacy
    * `conv(substring(md5(c),17,15),16,10)` spelling. */
  def md5LongHalf(c: Column, half: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Md5Long60Expr(ColumnBridge.expression(c), half))
      .cast(LongType)
  }

  /** Seeded variant: h_i(s) = md5Long(s || '|' || i). */
  def md5LongSeeded(c: Column, seed: Column): Column =
    md5Long(concat(c, lit("|"), seed.cast("string")))

  /** Content-defined-chunking boundary END positions of a document —
    * see [[CdcBoundsExpr]]. One O(len) pass replacing the per-position
    * explode + substr + md5Long probe (r17). */
  def cdcBounds(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CdcBoundsExpr(ColumnBridge.expression(c)))
  }

  /** Reference st_mode rendering: 19-char zero-padded binary string
    * ("{0:019b}".format(st_mode), storcrawl.py:361). */
  def modeBits(c: Column): Column = lpad(bin(c), 19, "0")

  /** `find_extension` as a codegen-friendly Column, per the reference
    * loop (storcrawl.py:259-268) including both Appendix-A1 quirks:
    *
    *  1. the scan runs over a tail window, then *wraps* and rescans the
    *     whole string from position 0;
    *  2. the window check is `path[i:i+1] == '.'`, and at `i = -1` that
    *     Python slice is always empty — so the window covers the last
    *     min(len,7) characters EXCLUDING the final one; the final char
    *     is only reachable via the wrap-around phase.
    *
    * Net spec: first '.' among characters [len-7, len-2] (0-based,
    * clamped at 0); else first '.' anywhere; suffix after it (empty for
    * a trailing dot); NULL when no dot exists. The 7-char window is
    * fixed — extension_length=6 is the only value that works in the
    * reference (Appendix A2). */
  def findExtensionCol(path: Column): Column = {
    val len = length(path)
    val winStart = greatest(len - 6, lit(1)) // 1-based
    val winLen = greatest(len - winStart, lit(0)) // excludes final char
    val win = path.substr(winStart, winLen)
    val winDot = instr(win, ".")
    val anyDot = instr(path, ".")
    when(winDot > 0, path.substr(winStart + winDot, len))
      .when(anyDot > 0, path.substr(anyDot + 1, len))
      .otherwise(lit(null).cast("string"))
  }

  /** DuckDB-SQL rendering of [[findExtensionCol]] over an expression
    * `p` — kept here so the Spark plan and the oracle text share one
    * definition site. */
  def findExtensionDuckSql(p: String): String =
    s"""CASE
       |  WHEN strpos(substr($p, greatest(length($p)-6,1), greatest(length($p)-greatest(length($p)-6,1),0)), '.') > 0
       |  THEN substr($p, greatest(length($p)-6,1) + strpos(substr($p, greatest(length($p)-6,1), greatest(length($p)-greatest(length($p)-6,1),0)), '.'))
       |  WHEN strpos($p, '.') > 0 THEN substr($p, strpos($p, '.') + 1)
       |  ELSE NULL END""".stripMargin.replaceAll("\\s+", " ").trim

  /** Byte-faithful Scala port of the reference loop (used by the
    * quirk-fidelity spec, which asserts it agrees with
    * [[findExtensionCol]] on generated inputs). */
  val findExtensionScala: String => String = { path =>
    if (path == null) null
    else {
      val len = path.length
      val chrs = math.min(len, 7) // extension_length(6)+1, storcrawl.py:260-263
      // python: for i in range(-chrs, len): if path[i:i+1]=='.': return path[i+1:]
      // i = -1 can never match (slice [-1:0] is empty); i<0 indexes from end
      val idxs = (-chrs until len).iterator.collect {
        case i if i < -1 => len + i
        case i if i >= 0 => i
      }
      idxs.find(i => path.charAt(i) == '.') match {
        case Some(i) => path.substring(i + 1)
        case None    => null
      }
    }
  }

  /** Slash-delimited prefixes of a path INCLUDING the path itself and
    * the filesystem root, as (prefix, depth) structs so callers can
    * take the max depth for nearest-ancestor-wins (J1,
    * storcrawl.py:245-256 — the reference checks the exact path first,
    * walks dirname up, and does consult an owner mapped at b'/').
    * '/a/b/c' -> [('/',0), ('/a',2), ('/a/b',3), ('/a/b/c',4)];
    * 'a/b' -> [('a',1), ('a/b',2)] (relative paths stop at their first
    * segment — divergence A7: the reference recurses forever on them).
    * Depth values are ordering keys only (deeper = nearer), not level
    * numbers. */
  def ancestorPrefixes(path: Column, maxParts: Int = Int.MaxValue): Column = {
    // split('/a/b/c', '/') = ['', 'a', 'b', 'c']; the k-part prefix
    // joins the first k parts back with '/'; the leading-'' part makes
    // k=1 empty for absolute paths (dropped, replaced by the '/' root).
    // maxParts caps k when the consumer knows deeper prefixes are
    // useless (a k-part prefix has k-1 separators — Owners bounds k by
    // the dim's max '/'-count + 1); default keeps the original
    // expression tree node-for-node.
    val parts = split(path, "/")
    val n = size(parts)
    val kMax =
      if (maxParts == Int.MaxValue) greatest(n, lit(1))
      else greatest(least(n, lit(maxParts)), lit(1))
    val base = filter(
      transform(
        sequence(lit(1), kMax),
        k =>
          struct(
            concat_ws("/", slice(parts, lit(1), k)).as("prefix"),
            k.as("depth")
          )
      ),
      s => s.getField("depth") <= n && length(s.getField("prefix")) > 0
    )
    val root = when(path.startsWith("/"),
        array(struct(lit("/").as("prefix"), lit(0).as("depth"))))
      .otherwise(array().cast("array<struct<prefix:string,depth:int>>"))
    concat(root, base)
  }
}
