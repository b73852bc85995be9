package graft.crawl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Paths
import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 crawl source — the SURVEY §7.4 stretch: the whole
  * crawl (recursive listing + lstat enrichment) as ONE distributed scan
  * operator, so deep trees never round-trip the driver per BFS level
  * (FsScanner's loop does; this provider's driver work is a single
  * shallow expansion).
  *
  *   spark.read.format("graft.crawl.CrawlFsProvider")
  *     .option("roots", "/data1,/data2")
  *     .option("exclusions", ".snapshot")
  *     .option("targetPartitions", "64")
  *     .option("pathMode", "binary")        // bytea-parity paths
  *     .option("maxLooseEntries", "100000") // driver buffering cap
  *     .load()
  *
  * Planning: BFS from the roots only until the frontier holds ≥
  * targetPartitions × oversubscribe subtree units; each pending
  * directory becomes an InputPartition that walks its whole subtree
  * executor-side. Entries already seen during the shallow expansion are
  * distributed round-robin as "loose" rows so every entry is emitted
  * exactly once. Driver memory is bounded: once maxLooseEntries entries
  * have been buffered, remaining frontier directories are NOT listed on
  * the driver — they defer to subtree partitions (a wide-shallow root
  * cannot balloon the planner). Reference semantics (A4/A5, symlink
  * non-descent, null-stat errors) are inherited from
  * FsScanner.listDirBytes / StatEnricher.statOne.
  *
  * Skew: subtree sizes are unknowable at plan time (statting them IS
  * the crawl), so packing a few coarse subtrees into targetPartitions
  * tasks would pin the every-real-filesystem-has-one giant project
  * directory to a single task for the whole job. The planner therefore
  * OVERSUBSCRIBES the SPLITTING: it keeps expanding one shallow level
  * at a time until ~oversubscribe× more work units than target
  * partitions exist, then interleaves those fine units round-robin
  * into at most targetPartitions partitions — a hot directory's
  * sub-units spread across tasks while per-task overhead (output
  * commit, scheduling) stays at targetPartitions. On a large cluster,
  * raise targetPartitions (2–4× total cores is conventional) and the
  * same mechanism yields scheduler-level work stealing. Splitting
  * never stops early on the loose budget: past it, a listed dir
  * becomes a dir-only `shallow` unit (entries re-listed executor-side,
  * only the child-dir paths stay on the driver), so a hot subtree
  * keeps being split regardless of readdir order. The residual worst
  * case (one directory that is 90% of the filesystem in ONE flat
  * readdir) degrades to one long listing task, not a failure.
  *
  * `pathMode=binary` emits `path`/`name` as BinaryType carrying the
  * exact readdir bytes (the reference's bytea fidelity,
  * storcrawl.py:132-148; see [[PathBytes]]) — a crawl over non-UTF-8
  * filenames is lossless. Default `string` keeps the UTF-8 display
  * schema.
  *
  * At 1000 executors: the shallow expansion costs the driver a few
  * hundred listdir calls; everything below — the 100 TB of metadata —
  * is partitioned subtree walks with per-partition fan-out bounded by
  * the deepest single directory, the same load profile as the
  * reference's shared dir_queue without its lock contention.
  */
class CrawlFsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CrawlFsSource.schemaFor(CrawlFsSource.isBinary(options))
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CrawlFsTable(
      CrawlFsSource.isBinary(new CaseInsensitiveStringMap(properties)))
}

object CrawlFsSource {
  private[crawl] def isBinary(options: CaseInsensitiveStringMap): Boolean =
    options.getOrDefault("pathMode", "string") == "binary"

  def schemaFor(binaryPaths: Boolean): StructType = {
    val pathType: DataType = if (binaryPaths) BinaryType else StringType
    StructType(Seq(
      StructField("path", pathType, nullable = false),
      StructField("name", pathType, nullable = false),
      StructField("is_dir", BooleanType, nullable = false),
      StructField("is_symlink", BooleanType, nullable = false),
      StructField("extension", StringType, nullable = true),
      StructField("st_mode", StringType, nullable = true),
      StructField("st_ino", LongType, nullable = true),
      StructField("st_dev", StringType, nullable = true),
      StructField("st_nlink", IntegerType, nullable = true),
      StructField("st_uid", LongType, nullable = true),
      StructField("st_gid", LongType, nullable = true),
      StructField("st_size", LongType, nullable = true),
      StructField("st_atime", LongType, nullable = true),
      StructField("st_mtime", LongType, nullable = true),
      StructField("st_ctime", LongType, nullable = true),
      StructField("error", StringType, nullable = true)))
  }

  val schema: StructType = schemaFor(binaryPaths = false)

  val DefaultMaxLooseEntries = 100000

  /** Streaming watermark safety lag (seconds): `latestOffset` trails
    * wall clock by this much so an mtime stamped just before planning
    * is already on disk when the batch's executor-side listing runs.
    * st_mtime is whole seconds, so sub-second lag buys nothing. */
  val DefaultWatermarkLagSec = 2L

  /** Subtree units planned per target partition (task-granularity
    * headroom for scheduler-side work stealing). */
  val DefaultOversubscribe = 4

  /** Driver-side bridge handing live crawl counters into the scan: DSv2
    * options are strings, so [[graft.crawl.Crawl.run]] registers the
    * accumulators under a token and passes the token as an option. The
    * scan builder (driver-side) resolves it and the READER FACTORY
    * carries the accumulators into executor tasks — accumulator
    * updates then flow back through normal task completion, so counts
    * tick DURING the scan (live ProgressListener cadence) with zero
    * plan impact: no extra map stage, columnar codegen untouched.
    * Standard accumulator caveat applies: a retried/speculative task
    * re-counts its partition (same contract as counting in any
    * transformation). Entries are tiny (4 accumulator refs); the
    * registry evicts OLDEST-FIRST past a generous cap rather than
    * requiring deterministic unregistration (plan time is lazy, after
    * run() returns) — a live registration is only at risk after 256
    * NEWER crawls registered before its scan planned. */
  private val counterRegistry =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, CrawlCounters](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, CrawlCounters]): Boolean = size() > 256
      })

  private[crawl] def registerCounters(c: CrawlCounters): String = {
    val token = java.util.UUID.randomUUID().toString
    counterRegistry.put(token, c)
    token
  }

  private[crawl] def countersFor(token: String): Option[CrawlCounters] =
    Option(token).filter(_.nonEmpty).flatMap(t => Option(counterRegistry.get(t)))
}

class CrawlFsTable(binaryPaths: Boolean) extends Table with SupportsRead {
  def this() = this(false)
  override def name(): String = "crawlfs"
  override def schema(): StructType = CrawlFsSource.schemaFor(binaryPaths)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CrawlFsScanBuilder(
      options.getOrDefault("roots", ""),
      options.getOrDefault("exclusions", FsScanner.DefaultExclusions.mkString(",")),
      options.getOrDefault("targetPartitions", "64").toInt,
      options.getOrDefault("maxLooseEntries",
        CrawlFsSource.DefaultMaxLooseEntries.toString).toInt,
      binaryPaths,
      options.getOrDefault("oversubscribe",
        CrawlFsSource.DefaultOversubscribe.toString).toInt,
      options.getOrDefault("countersToken", ""),
      options.getOrDefault("watermarkLagSec",
        CrawlFsSource.DefaultWatermarkLagSec.toString).toLong)
}

class CrawlFsScanBuilder(
    roots: String, exclusions: String, targetParts: Int,
    maxLoose: Int, binaryPaths: Boolean, overSub: Int,
    countersToken: String = "",
    watermarkLagSec: Long = CrawlFsSource.DefaultWatermarkLagSec) extends ScanBuilder {
  override def build(): Scan = new CrawlFsScan(
    roots.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
    exclusions.split(",").map(_.trim).filter(_.nonEmpty).toSet,
    targetParts, maxLoose, binaryPaths, overSub, countersToken, watermarkLagSec)
}

/** One partition: whole subtrees to walk, shallow directories to list
  * non-recursively (their children are other units), and loose entries
  * found during the driver's expansion. Paths travel as raw bytes so
  * non-UTF-8 directory names survive driver→executor serialization. */
final case class CrawlFsPartition(
    subtrees: Seq[Array[Byte]],
    loose: Seq[RawEntry],
    shallow: Seq[Array[Byte]] = Nil) extends InputPartition

class CrawlFsScan(
    roots: Seq[String], val excl: Set[String], targetParts: Int,
    maxLoose: Int, val binaryPaths: Boolean, overSub: Int,
    val countersToken: String = "",
    watermarkLagSec: Long = CrawlFsSource.DefaultWatermarkLagSec) extends Scan with Batch {
  def this(roots: Seq[String], excl: Set[String], targetParts: Int) =
    this(roots, excl, targetParts, CrawlFsSource.DefaultMaxLooseEntries, false,
      CrawlFsSource.DefaultOversubscribe)
  override def readSchema(): StructType = CrawlFsSource.schemaFor(binaryPaths)
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CrawlFsMicroBatchStream(this, watermarkLagSec)

  override def planInputPartitions(): Array[InputPartition] = {
    // shallow BFS on the driver until enough work units exist for
    // scheduler-side work stealing (oversubscribe× the partition
    // target — one giant subtree then costs one long TASK, not the
    // whole job). While the loose-entry budget lasts, a listed dir's
    // entries buffer on the driver; once it is spent, splitting
    // CONTINUES in dir-only mode: the dir becomes a `shallow` unit
    // (its direct entries will be re-listed executor-side, nothing
    // buffers here beyond the one transient listing) and its child
    // dirs keep feeding the frontier — so a hot subtree keeps being
    // split no matter where readdir order put it relative to the
    // budget.
    val unitTarget = math.max(targetParts, targetParts * math.max(1, overSub))
    var frontier: Seq[Array[Byte]] = roots.map(r => PathBytes.fromPath(Paths.get(r)))
    val shallow = mutable.ArrayBuffer.empty[Array[Byte]]
    val loose = mutable.ArrayBuffer.empty[RawEntry]
    while (frontier.nonEmpty && frontier.size + shallow.size < unitTarget) {
      val next = mutable.ArrayBuffer.empty[Array[Byte]]
      frontier.foreach { dir =>
        val (entries, children) = FsScanner.listDirBytes(dir, excl)
        if (loose.size < maxLoose) loose ++= entries
        else shallow += dir
        next ++= children
      }
      frontier = next.toSeq
    }
    val subtrees = frontier
    // partition count driven by total work, not just remaining subtrees:
    // a shallow-but-huge directory drains the frontier while loading all
    // its entries into `loose`, and collapsing to 1 partition would stat
    // the whole tree on one core. Loose entries still cost one lstat
    // each executor-side, so they spread over at least targetParts
    // (parallel stat fan-out) in ~1024-entry chunks, never more
    // partitions than entries.
    val looseUnits =
      if (loose.isEmpty) 0
      else math.min(loose.size, math.max(targetParts, loose.size / 1024))
    val workUnits = math.max(subtrees.size + shallow.size, looseUnits)
    // pack the (oversubscribed, fine-grained) units into at most
    // targetParts partitions: balance comes from interleaving ~overSub
    // units per task, WITHOUT multiplying per-task overhead (output
    // commit per task is pure loss on a local disk; on a cluster, raise
    // targetPartitions itself for scheduler-level stealing)
    val n = math.max(1, math.min(targetParts, workUnits))
    val subtreeGroups = Array.fill(n)(mutable.ArrayBuffer.empty[Array[Byte]])
    subtrees.zipWithIndex.foreach { case (d, i) => subtreeGroups(i % n) += d }
    val shallowGroups = Array.fill(n)(mutable.ArrayBuffer.empty[Array[Byte]])
    shallow.zipWithIndex.foreach { case (d, i) => shallowGroups((i + 1) % n) += d }
    val looseGroups = Array.fill(n)(mutable.ArrayBuffer.empty[RawEntry])
    loose.zipWithIndex.foreach { case (e, i) => looseGroups(i % n) += e }
    (0 until n).map { i =>
      CrawlFsPartition(subtreeGroups(i).toSeq, looseGroups(i).toSeq,
        shallowGroups(i).toSeq): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // resolved driver-side; the factory carries the accumulators into
    // the serialized task closure
    new CrawlFsReaderFactory(excl, binaryPaths,
      CrawlFsSource.countersFor(countersToken))
}

class CrawlFsReaderFactory(
    excl: Set[String], binaryPaths: Boolean,
    ctrs: Option[CrawlCounters] = None)
    extends PartitionReaderFactory {
  def this(excl: Set[String]) = this(excl, false)
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CrawlFsReader(p.asInstanceOf[CrawlFsPartition], excl, binaryPaths, ctrs)
}

/** Executor-side subtree walk + stat, streaming rows (no buffering of
  * the whole subtree in memory — a work stack of pending dirs only).
  *
  * `mtimeRange = Some((start, end))` turns the reader into one
  * micro-batch of the streaming source: only entries whose st_mtime
  * lies in `(start, end]` are emitted (stat-error rows, which have no
  * mtime, surface in the initial snapshot batch `start < 0` only). */
class CrawlFsReader(
    part: CrawlFsPartition, excl: Set[String], binaryPaths: Boolean,
    ctrs: Option[CrawlCounters] = None,
    mtimeRange: Option[(Long, Long)] = None)
    extends PartitionReader[InternalRow] {
  def this(part: CrawlFsPartition, excl: Set[String]) = this(part, excl, false)

  private val pendingDirs = mutable.Stack[Array[Byte]](part.subtrees: _*)
  private val pendingShallow = mutable.Stack[Array[Byte]](part.shallow: _*)
  private var entryIter: Iterator[RawEntry] = part.loose.iterator
  private var current: InternalRow = _

  private def inWindow(m: FileMeta): Boolean = mtimeRange match {
    case None => true
    case Some((start, end)) =>
      // window on max(mtime, ctime): userspace can back-date mtime
      // (cp -p, tar -x, rsync -a) but NOT ctime — the kernel stamps it
      // at creation/metadata change, so an extracted file with a 2019
      // mtime still enters the stream through its extraction-time
      // ctime. A pre-epoch (negative) change time still belongs to the
      // snapshot batch (start < 0 admits every t <= end).
      (m.st_mtime, m.st_ctime) match {
        case (None, None) => start < 0 // error rows belong to the snapshot
        case (mt, ct) =>
          val t = math.max(mt.getOrElse(Long.MinValue), ct.getOrElse(Long.MinValue))
          (start < 0 || t > start) && t <= end
      }
  }

  override def next(): Boolean = {
    while (true) {
      while (!entryIter.hasNext && (pendingShallow.nonEmpty || pendingDirs.nonEmpty)) {
        if (pendingShallow.nonEmpty) {
          // dir-only planner unit: emit direct entries, do NOT descend —
          // the children are other partitions' units
          entryIter = FsScanner.listDirBytes(pendingShallow.pop(), excl)._1.iterator
        } else {
          val (entries, children) = FsScanner.listDirBytes(pendingDirs.pop(), excl)
          pendingDirs.pushAll(children)
          entryIter = entries.iterator
        }
      }
      if (!entryIter.hasNext) return false
      val e = entryIter.next()
      val m = StatEnricher.statOne(e)
      if (inWindow(m)) {
        // counters tick per EMITTED entry (after the streaming window
        // filter): a micro-batch re-lists the whole tree, and counting
        // scanned-not-emitted rows would re-add the full tree's volume
        // every batch. Batch mode has no window, so behavior there is
        // unchanged.
        ctrs.foreach { c =>
          if (e.isDir) c.dirsSeen.add(1) else c.filesSeen.add(1)
          m.st_size.foreach(c.totalSize.add)
          if (m.error.isDefined) c.statErrors.add(1)
        }
        current = toRow(e, m)
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()

  private def utf(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def bytesOf(e: RawEntry): Array[Byte] =
    if (e.pathBytes.nonEmpty) e.pathBytes else e.path.getBytes(UTF_8)

  private def toRow(e: RawEntry, m: FileMeta): InternalRow = {
    val (pathVal, nameVal): (Any, Any) =
      if (binaryPaths) (bytesOf(e), PathBytes.nameOf(bytesOf(e)))
      else (utf(m.path), utf(e.name))
    new GenericInternalRow(Array[Any](
      pathVal, nameVal, e.isDir, e.isSymlink,
      m.extension.map(utf).orNull,
      m.st_mode.map(utf).orNull,
      m.st_ino.map(Long.box).orNull,
      m.st_dev.map(utf).orNull,
      m.st_nlink.map(Int.box).orNull,
      m.st_uid.map(Long.box).orNull,
      m.st_gid.map(Long.box).orNull,
      m.st_size.map(Long.box).orNull,
      m.st_atime.map(Long.box).orNull,
      m.st_mtime.map(Long.box).orNull,
      m.st_ctime.map(Long.box).orNull,
      m.error.map(utf).orNull))
  }
}

/** Streaming offset: the high-watermark epoch SECOND already emitted
  * (st_mtime granularity). `-1` = nothing emitted yet. */
final case class CrawlFsOffset(sec: Long) extends Offset {
  override def json: String = s"""{"sec":$sec}"""
}

object CrawlFsOffset {
  private val SecRe = """\{\s*"sec"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(json: String): CrawlFsOffset = json match {
    case SecRe(s) => CrawlFsOffset(s.toLong)
    case other => sys.error(s"malformed crawl offset: $other")
  }
}

/** T4 — the crawl as a Structured Streaming source: incremental
  * re-crawl per micro-batch.
  *
  * Batch N emits exactly the entries whose change time —
  * `max(st_mtime, st_ctime)`, so additions with PRESERVED old mtimes
  * (`cp -p`, `tar -x`, `rsync -a`) still surface via their
  * kernel-stamped ctime — lies in `(offset(N-1), offset(N)]`; the
  * first batch (`start = -1`) is the full snapshot, including
  * pre-epoch timestamps and stat-error rows. Offsets are
  * planner-chosen wall-clock seconds trailing real time by `lagSec` —
  * by the time a second is inside a batch window, every timestamp
  * stamped in it was already on disk when the batch's listing ran
  * (times are second-granular, so the lag must be ≥ 1s; clock skew
  * between driver and filesystem adds to it). Deletions don't surface
  * (no tombstones in a listing); pair the stream with [[CrawlDiff]]
  * over checkpointed snapshots when removal tracking matters.
  *
  * Each batch re-plans the same oversubscribed subtree partitioning as
  * the batch scan and re-lists executor-side — an incremental crawl IS
  * a crawl; what's incremental is the emitted delta, which is what
  * downstream state (dedup, rollups, JDBC sinks) actually pays for.
  * Offset progression is monotone and checkpoint-replayable: planning
  * the same `(start, end]` window again re-emits the same mtime
  * interval (exactly-once downstream via the usual idempotent-sink
  * contract, e.g. [[graft.streaming.StatusStream]]'s per-batch
  * overwrite).
  */
class CrawlFsMicroBatchStream(scan: CrawlFsScan, lagSec: Long)
    extends MicroBatchStream {

  private var lastEnd: Long = -1L

  override def initialOffset(): Offset = CrawlFsOffset(-1L)

  override def latestOffset(): Offset = {
    val now = System.currentTimeMillis() / 1000L - math.max(0L, lagSec)
    lastEnd = math.max(lastEnd, now)
    CrawlFsOffset(lastEnd)
  }

  override def deserializeOffset(json: String): Offset = {
    val o = CrawlFsOffset.fromJson(json)
    // restart monotonicity: any offset Spark hands back was emitted by
    // a previous incarnation — clamp so latestOffset never regresses
    // below the checkpoint on a driver whose clock is behind (a
    // regressed watermark would re-emit the already-processed window)
    lastEnd = math.max(lastEnd, o.sec)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CrawlFsOffset].sec
    val e = end.asInstanceOf[CrawlFsOffset].sec
    if (e <= s) Array.empty
    else scan.planInputPartitions().map { p =>
      CrawlFsStreamPartition(p.asInstanceOf[CrawlFsPartition], s, e): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // same counters bridge as the batch path — live accumulators tick
    // per emitted entry in streaming mode too
    new CrawlFsStreamReaderFactory(scan.excl, scan.binaryPaths,
      CrawlFsSource.countersFor(scan.countersToken))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class CrawlFsStreamPartition(
    inner: CrawlFsPartition, startSec: Long, endSec: Long) extends InputPartition

class CrawlFsStreamReaderFactory(
    excl: Set[String], binaryPaths: Boolean,
    ctrs: Option[CrawlCounters] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[CrawlFsStreamPartition]
    new CrawlFsReader(sp.inner, excl, binaryPaths, ctrs,
      Some((sp.startSec, sp.endSec)))
  }
}
