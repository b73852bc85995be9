package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference report CLI's eight actions (report.py:217-235) over a
  * crawled `files` table and its `status` stream — the surface a
  * storage-crawler user actually invokes, re-expressed as Catalyst
  * plans. Each action is a DataFrame function; [[ReportMain]] is the
  * CLI.
  *
  * Semantics are verbatim from report.py (quirks preserved per
  * SURVEY.md Appendix A):
  *  - `large_old_files` (A9) really selects large RECENTLY-CHANGED
  *    files: size ≥ 3 GiB AND (ctime|mtime within ~7.04 days of now);
  *  - `status-brief` is latest-row-per-metric via MAX(id);
  *  - `first_thousand` (A10) gains a total ORDER BY for determinism.
  */
object ReportActions {

  val LargeSize = 3221225472L // report.py:235
  val Delta = 608400L         // report.py:235

  /** S6 — schema introspection (report.py:103-112): one row per column,
    * like information_schema.columns. */
  def schemaOf(df: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("column_name", "data_type", "is_nullable")
  }

  /** status-full (report.py:114-120). */
  def statusFull(status: DataFrame): DataFrame =
    status.select(
        date_trunc("SECOND", col("time")).as("time"),
        col("status"), col("value"), col("units"))
      .orderBy("time", "status")

  /** status-events (report.py:123-131): units='event' filter. */
  def statusEvents(status: DataFrame): DataFrame =
    status.filter(col("units") === "event")
      .select(date_trunc("SECOND", col("time")).as("time"), col("status"))
      .orderBy("time", "status")

  /** status-averages (report.py:134-145): AVG of '%rate' metrics. */
  def statusAverages(status: DataFrame): DataFrame =
    status.filter(col("status").like("%rate"))
      .groupBy("status", "units")
      .agg(avg(col("value")).as("avg"))
      .select(col("status"), col("avg"), col("units"))
      .orderBy("units", "status")

  /** status-brief (report.py:148-159): latest row per metric via the
    * MAX(id) semi-join idiom, planned as max_by (no sort, no subquery). */
  def statusBrief(status: DataFrame): DataFrame =
    status
      .groupBy("status")
      .agg(
        max_by(struct(col("time"), col("value"), col("units")), col("id")).as("s"))
      .select(
        date_trunc("SECOND", col("s.time")).as("time"),
        col("status"), col("s.value").as("value"), col("s.units").as("units"))
      .orderBy("time", "status")

  /** first_thousand (report.py:162-175) + A10 total order. */
  def firstThousand(files: DataFrame): DataFrame =
    files.orderBy("path").limit(1000)

  /** large_old_files (report.py:178-209): predicate+projection+sort as
    * written, with the reference's JSON column order
    * (insert_ts,path,ext,uid,gid,size,atime,ctime,mtime,owner). `now`
    * is injectable for determinism. */
  def largeOldFiles(files: DataFrame, nowEpoch: Long): DataFrame =
    files
      .filter(
        col("st_size") >= LargeSize &&
        (col("st_ctime") + Delta >= nowEpoch ||
         col("st_mtime") + Delta >= nowEpoch))
      .select(
        unix_timestamp(date_trunc("SECOND", col("insert_time")))
          .cast(LongType).as("insert_ts"),
        col("path"),
        col("extension").as("ext"),
        col("st_uid").as("uid"),
        col("st_gid").as("gid"),
        col("st_size").as("size"),
        col("st_atime").as("atime"),
        col("st_ctime").as("ctime"),
        col("st_mtime").as("mtime"),
        col("owner"))
      .orderBy(
        greatest(col("st_mtime"), col("st_ctime")).desc,
        least(col("st_mtime"), col("st_ctime")).desc,
        col("path"))

  /** Directory test on the 19-bit mode string: the FULL S_IFMT nibble
    * (bits 15..12 → positions 4..7), not just bit 14 — sockets (1100)
    * and block devices (0110) share bit 14 with directories (0100) and
    * must not be misclassified. */
  private def isDirMode = col("st_mode").substr(4, 4) === "0100"

  /** Hardlink groups: non-directory entries sharing (st_dev, st_ino) —
    * physically ONE file reachable under several names, the case every
    * naive per-path accounting double-counts. `st_nlink > 1`
    * prefilters cheaply before the group shuffle; the post-group
    * `n_links > 1` keeps only inodes with MULTIPLE names inside the
    * crawl (an inode whose other links live outside the roots is not a
    * duplicate here). One hash aggregation on (dev, ino). */
  def hardlinkGroups(files: DataFrame): DataFrame =
    files
      .filter(col("st_nlink") > 1 && !isDirMode && col("st_ino").isNotNull)
      .groupBy(col("st_dev"), col("st_ino"))
      .agg(
        count(lit(1)).as("n_links"),
        min(col("path")).as("canonical_path"),
        min(col("st_size")).as("st_size"))
      .filter(col("n_links") > 1)
      .orderBy("st_dev", "st_ino")

  /** Physical vs logical usage: bytes counted once per inode
    * (physical — what the filesystem actually stores) next to the
    * per-name sum (logical — what a path rollup reports). The gap IS
    * the hardlink double-count. */
  def physicalUsage(files: DataFrame): DataFrame =
    files
      .filter(!isDirMode && col("st_size").isNotNull && col("st_ino").isNotNull)
      .groupBy(col("st_dev"), col("st_ino"))
      .agg(min(col("st_size")).as("sz"), count(lit(1)).as("names"))
      .agg(
        sum(col("sz")).as("physical_bytes"),
        sum(col("sz") * col("names")).as("logical_bytes"),
        count(lit(1)).as("n_inodes"))

  /** Dispatch table mirroring report.py:217-235 action names. */
  def run(
      spark: SparkSession,
      action: String,
      files: => DataFrame,
      status: => DataFrame,
      nowEpoch: Long = System.currentTimeMillis() / 1000): DataFrame =
    // report.py:217 lowercases the action before dispatch
    // (config.action.lower()), and report.py:224-225 accepts bare
    // "status" as an alias for the brief view — both mirrored here.
    // Locale.ROOT: Python's str.lower() is locale-independent; the
    // default-locale toLowerCase would turn "FILES" into dotless-ı
    // "fıles" under Turkish-family locales and miss every case.
    action.toLowerCase(java.util.Locale.ROOT) match {
      case "schema-files"    => schemaOf(files, spark)
      case "schema-status"   => schemaOf(status, spark)
      case "schema-all"      => schemaOf(files, spark).unionAll(schemaOf(status, spark))
      case "status-full"     => statusFull(status)
      case "status-events"   => statusEvents(status)
      case "status-averages" => statusAverages(status)
      case "status" | "status-brief" => statusBrief(status)
      // report.py defines first_thousand (report.py:166) but never
      // wires it into the dispatch table — dispatching it here is a
      // deliberate completion, not reference behavior
      case "first_thousand"  => firstThousand(files)
      case "large_old_files" => largeOldFiles(files, nowEpoch)
      // extensions beyond report.py's eight actions
      case "hardlink_groups" => hardlinkGroups(files)
      case "physical_usage"  => physicalUsage(files)
      case other => sys.error(
        s"unknown action: $other (report.py:217-235 names, " +
          "or hardlink_groups|physical_usage)")
    }

  // ---- repr()-faithful CSV display (report.py:88-101) ----------------
  //
  // The reference renders each cell with Python `repr()` (datetimes via
  // isoformat(' ')) and comma-joins — so strings appear quoted with
  // Python escape rules and floats in Python's shortest round-trip
  // form. These functions reproduce that byte-for-byte for the types a
  // report row carries. One deliberate divergence: bytea cells render
  // as a bytes literal b'..' (psycopg2 hands repr() a memoryview whose
  // repr embeds a heap address — unreproducible garbage not worth
  // porting).

  /** Python str.isprintable() per code point: false for the Unicode
    * categories C* and Z* (except the plain space) — CPython's rule,
    * mirrored through Java's category tables (rare UNASSIGNED points
    * can differ across Unicode table versions). */
  private val NonPrintableCats: Set[Int] = Set(
    Character.CONTROL, Character.FORMAT, Character.SURROGATE,
    Character.PRIVATE_USE, Character.UNASSIGNED,
    Character.LINE_SEPARATOR, Character.PARAGRAPH_SEPARATOR,
    Character.SPACE_SEPARATOR).map(_.toInt)

  private def pyPrintable(cp: Int): Boolean =
    cp == ' ' || !NonPrintableCats.contains(Character.getType(cp))

  private def pyUnicodeEscape(cp: Int): String =
    if (cp < 0x100) f"\\x$cp%02x"
    else if (cp <= 0xffff) f"\\u$cp%04x"
    else f"\\U$cp%08x"

  /** Python str repr: preferred single quotes, double when the string
    * contains ' but no ", backslash escapes, \xNN/\uNNNN/\UNNNNNNNN
    * for everything CPython's isprintable() rejects. */
  private[graft] def pyStrRepr(s: String): String = {
    val q = if (s.contains('\'') && !s.contains('"')) '"' else '\''
    val sb = new StringBuilder
    sb += q
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cp match {
        case '\\'                 => sb ++= "\\\\"
        case c if c == q          => sb += '\\' += q
        case '\n'                 => sb ++= "\\n"
        case '\r'                 => sb ++= "\\r"
        case '\t'                 => sb ++= "\\t"
        case c if !pyPrintable(c) => sb ++= pyUnicodeEscape(c)
        case c                    => sb.appendAll(Character.toChars(c))
      }
      i += Character.charCount(cp)
    }
    (sb += q).toString
  }

  /** Python bytes repr: same quote preference as str (double quotes
    * when the bytes contain ' and no "), printable ASCII kept. */
  private[graft] def pyBytesRepr(bytes: Array[Byte]): String = {
    val hasS = bytes.contains('\''.toByte)
    val hasD = bytes.contains('"'.toByte)
    val q: Char = if (hasS && !hasD) '"' else '\''
    val sb = new StringBuilder("b")
    sb += q
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      c match {
        case '\\'        => sb ++= "\\\\"
        case c if c == q => sb += '\\' += q
        case '\n'        => sb ++= "\\n"
        case '\r'        => sb ++= "\\r"
        case '\t'        => sb ++= "\\t"
        case c if c >= ' ' && c < '\u007f' => sb += c
        case _           => sb ++= f"\\x${b & 0xff}%02x"
      }
    }
    (sb += q).toString
  }

  /** Python float repr: SHORTEST round-trip digits (not Java 17's
    * Double.toString, which can emit one extra mantissa digit on large
    * magnitudes) laid out under Python's formatting rule (positional
    * iff the leading digit's decimal exponent is in (-5, 16), else
    * `d.dddde±NN`). Shortest-by-construction: round the exact binary
    * value to p significant decimals (HALF_EVEN) for growing p until
    * the result parses back to the same double — the same string the
    * Grisu/Ryu family produces. */
  private[graft] def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    val sign = if (d < 0) "-" else ""
    val abs = math.abs(d)
    val exact = new java.math.BigDecimal(abs) // exact binary expansion
    var shortest: java.math.BigDecimal = null
    var p = 1
    while (shortest == null && p <= 17) {
      val cand = exact.round(
        new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      if (cand.doubleValue() == abs) shortest = cand
      p += 1
    }
    val norm = shortest.stripTrailingZeros
    val digits = norm.unscaledValue.toString
    val exp10 = norm.precision - norm.scale - 1
    if (exp10 > -5 && exp10 < 16) {
      if (exp10 >= 0) {
        val intPart = digits.padTo(exp10 + 1, '0').take(exp10 + 1)
        val frac = digits.drop(exp10 + 1)
        sign + intPart + "." + (if (frac.isEmpty) "0" else frac)
      } else {
        sign + "0." + ("0" * (-exp10 - 1)) + digits
      }
    } else {
      val mant =
        if (digits.length == 1) digits
        else digits.take(1) + "." + digits.drop(1)
      val es = if (exp10 >= 0) "+" else "-"
      sign + mant + f"e$es${math.abs(exp10)}%02d"
    }
  }

  /** datetime.isoformat(' '): micros only when nonzero, always 6 digits. */
  private[graft] def pyTimestampRepr(ts: java.sql.Timestamp): String = {
    val ldt = java.time.LocalDateTime.ofInstant(
      ts.toInstant, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val micros = ldt.getNano / 1000
    if (micros == 0) base else f"$base.$micros%06d"
  }

  /** One cell, report.py:94-100 semantics. */
  private[graft] def pyRepr(v: Any): String = v match {
    case null                     => "None"
    case ts: java.sql.Timestamp   => pyTimestampRepr(ts)
    case s: String                => pyStrRepr(s)
    case b: Boolean               => if (b) "True" else "False"
    case d: Double                => pyFloatRepr(d)
    case f: Float                 => pyFloatRepr(f.toDouble)
    case bd: java.math.BigDecimal => s"Decimal('${bd.toPlainString}')"
    case bd: BigDecimal           => s"Decimal('${bd.bigDecimal.toPlainString}')"
    case bytes: Array[Byte]       => pyBytesRepr(bytes)
    case other                    => other.toString // int/long: repr == toString
  }

  /** One display row: repr-quoted cells, comma-joined (report.py:101). */
  def csvLine(r: org.apache.spark.sql.Row): String =
    r.toSeq.map(pyRepr).mkString(",")
}

/** CLI: runMain graft.crawl.ReportMain <action> --tag <tag> --base <dir>
  * over parquet written by [[CrawlMain]] (files at
  * `<base>/crawl_tag=<tag>`, status at `<base>/status_tag=<tag>`). */
object ReportMain {
  def main(args: Array[String]): Unit = {
    // configargparse layering as the reference (report.py:14-36):
    // CLI > STORCRAWL_* env > rc files; ACTION stays positional
    val (cli, positional) = ConfigLayers.parseArgs(
      args.toSeq, flags = Set("json", "debug", "verbose"))
    require(positional.size == 1,
      "usage: ReportMain <action> [--tag t] [--base dir] [--json] [--config-file rc]")
    val action = positional.head
    val tag = ConfigLayers.resolveOne("tag", cli, "crawl")
    val base = ConfigLayers.resolveOne("base", cli, "target/crawl_out")
    val asJson = ConfigLayers.resolve("json", cli)
      .lastOption.exists(ConfigLayers.isTrue)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-report-$tag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      lazy val files = spark.read.parquet(s"$base/crawl_tag=$tag")
      lazy val status = spark.read.parquet(s"$base/status_tag=$tag")
      val df = ReportActions.run(spark, action, files, status)
      // S8/S9 sinks: CSV-ish stdout (report.py:88-101) or JSON
      // (report.py:194-209), streamed like the reference's
      // fetchmany(1000) batched cursor (S10, report.py:79-86) — the
      // driver never holds the full result set
      if (asJson) df.toJSON.toLocalIterator().forEachRemaining(println(_))
      else {
        println(df.columns.mkString(","))
        df.toLocalIterator().forEachRemaining(r => println(ReportActions.csvLine(r)))
      }
    } finally spark.stop()
  }
}
