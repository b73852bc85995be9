package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

/** Workload benchmark: runs every declared query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Default mode executes with 8-way inter-query parallelism (a
  * throughput run — the queries are independent and Spark's FAIR-ready
  * scheduler overlaps plan compilation of one query with execution of
  * others, exactly as a concurrent analytics workload would).
  * "value" is the wall-clock total for the whole workload; the per-
  * query map reports individual latencies as observed inside the
  * concurrent run. Results are fully materialized (collect), never
  * count()-ed — count lets EliminateSorts drop final ORDER BYs and
  * under-measures.
  *
  * The default mode ("both") runs the repeated sequential passes FIRST
  * (per-query medians, cache cleared between queries — attributable to
  * the individual plan, so round-over-round regressions stop being
  * guesswork about queue contention; the passes double as codegen
  * warm-up) and then the concurrent run, whose wall is the headline
  * "value" (value_kind "concurrent_wall_warm"). SPARK_GRAFT_BENCH_MODE=
  * seq or concurrent runs just that pass. Failures are logged to
  * stderr in BOTH passes — a failed query's latency is visibly
  * invalid, never silently fast. Stdout carries one compact ms-rounded
  * line (must survive a ~4 KB tail capture); target/bench.json carries
  * the full-precision dual-map artifact.
  */
/** Checked-in per-query seq medians of the prior accepted round
  * (`bench_baseline.json`, flat {"query":seconds} map — regenerated
  * each round from the shipped artifact). Parsed with a two-token
  * regex, not a JSON library: the file is machine-written flat pairs.
  *
  * PROVENANCE CONTRACT (r12, after the q_knn_classify false flag):
  * every value must come from a FULL-SURFACE 5-pass seq run
  * (target/bench.json `queries_seq`) — the same context the
  * regression gate measures. Isolated SPARK_GRAFT_BENCH_ONLY medians
  * are sanity probes only and must never be committed as baselines:
  * the context mismatch reads as a regression for cache-sensitive
  * queries and every such flag so far was measurement skew, not a
  * plan change (PERF.md "Baseline protocol change"). Before adopting
  * a regenerated baseline, isolated-probe any query whose new/old
  * ratio exceeds 1.5× — adopt on context skew, fix on real
  * regression. */
object BenchBaseline {
  private val pair = """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r
  /** Looks in SPARK_GRAFT_BENCH_BASELINE, else cwd. A missing or
    * unparseable baseline DISABLES the regression gate, so that state
    * must be loud: one stderr line, never silence — a silently
    * disabled gate is indistinguishable from a clean run. */
  def load(path: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
                                            "bench_baseline.json")): Option[Map[String, Double]] = {
    loadAt(path)
  }
  /** The per-query executor-CPU baseline (bench_baseline_cpu.json,
    * written by regen_baseline.py beside the wall file) — the
    * load-invariant half of the r16 regression gate. Missing is
    * normal until the first r16-format close adopts one. */
  def loadCpu(path: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE_CPU",
                                               "bench_baseline_cpu.json")): Option[Map[String, Double]] = {
    loadAt(path)
  }
  private def loadAt(path: String): Option[Map[String, Double]] = {
    val p = java.nio.file.Paths.get(path)
    val r = if (!java.nio.file.Files.isReadable(p)) None
    else scala.util.Try {
      val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      pair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.toOption.filter(_.nonEmpty)
    if (r.isEmpty) System.err.println(
      s"[bench] no baseline at ${p.toAbsolutePath} — regression gate SKIPPED")
    r
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "both")

    // Host-load provenance (VERDICT r13: the committed r13 record was
    // measured inside a load-4..9 co-tenant window and its numbers were
    // not comparable round-over-round; adjudicating the five false
    // regression flags cost a judge probe). Every artifact now carries
    // the 1-min system load average sampled BEFORE the warmup, AFTER
    // each seq pass, and at the end. Only the pre-run sample gates
    // commit-grade: once the bench itself runs at local[N] it drives
    // host load to ~N, so mid-run samples are the adjudication record
    // (compare across rounds), not a gate.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadGate = sys.env.get("SPARK_GRAFT_BENCH_LOAD_GATE")
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption.filter(_ > 0))
      .getOrElse(2.0)
    val loadStart = loadAvg()
    // a negative sample means the platform exposes no load average —
    // "unknown" must fail the gate, not pass it (ADVICE r14: -1 <= 2.0
    // silently marked loaded-unknowable artifacts commit-grade)
    val loadKnown = loadStart >= 0
    val commitGrade = loadKnown && loadStart <= loadGate
    if (!loadKnown) System.err.println(
      "[bench] host load average UNAVAILABLE on this platform — artifact" +
        " marked commit_grade=false (quiet-host provenance unverifiable)")
    else if (!commitGrade) System.err.println(
      f"[bench] host load $loadStart%.2f exceeds gate $loadGate%.2f at start" +
        " — artifact marked commit_grade=false; do not adopt as baseline")
    // Per-PASS load gate (VERDICT r14 #5): the start sample gates the
    // artifact, but co-tenant windows that OPEN mid-run contaminated
    // r14's 14:03 driver artifact (per-pass loads to 16) while its
    // start load was borderline. Each query's wall now carries the
    // load sampled right after it ran; a query's MEDIAN is
    // commit-grade only when a majority of its passes ran under this
    // gate. The default 10.0 sits between the observed commit-grade
    // per-pass band (2.8-9.1, bench self-load included) and the
    // loaded-window band (5.5-16.1): it flags windows, not the bench's
    // own local[32] footprint.
    val passLoadGate = sys.env.get("SPARK_GRAFT_BENCH_PASS_LOAD_GATE")
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption.filter(_ > 0))
      .getOrElse(10.0)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf, must precede the first session: the janino class
      // cache defaults to 100 entries, but one pass over this surface
      // generates ~4 codegen stages × >100 queries — every pass evicts
      // everything and re-compiles. 4096 entries (~tens of MB of
      // classes) lets repeat passes and the shared fragments between
      // queries actually reuse compiled code, so medians measure
      // steady-state runtime, not janino. Env knob is the A/B lever
      // (PERF.md "codegen class cache" section).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // AQE post-shuffle sizing knobs (r16). The defaults are Spark's
      // own (parallelismFirst=true, 64m advisory) because the
      // alternative was MEASURED AND REJECTED: parallelismFirst=false
      // + a 4m advisory — the "respect the advisory size" production
      // recipe — coalesced the post-shuffle side of compute-dense
      // medium shuffles (gram explodes, per-doc windows: a few MB of
      // compressed bytes carrying seconds of downstream CPU) onto a
      // handful of tasks, and a 7-query isolated A/B measured walls
      // 2-2.5× WORSE at equal-or-higher load (q_winnowing 1.21→2.96 s,
      // q_ngram_containment 2.46→5.05 s, q_kruskal_wallis 0.81→2.11 s)
      // for a modest CPU saving — bytes are the wrong proxy for work
      // on these frames, and the parallelism floor is what keeps the
      // cores fed. On a production cluster with genuinely small
      // metadata shuffles the env knobs below flip the trade without
      // a rebuild; at 100 TB every corpus exchange exceeds any
      // advisory and AQE sizes them from data either way (PERF.md
      // r16 records the A/B).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query executor CPU / run / peak-memory attribution (VERDICT
    // r15 #1): every query invocation runs in its own job group, so a
    // group-keyed listener turns task metrics into the load-invariant
    // third column beside wall and GC. Registered before the warmup so
    // the first measured query's stages are all mapped.
    val groupMetrics = new GroupMetricsListener
    spark.sparkContext.addSparkListener(groupMetrics)
    // one untimed generic warmup to absorb session init (not a pre-run
    // of any measured query)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    // Per-query wall-clock watchdog (r8 lesson: one pathological plan —
    // q_winnowing at 853 s — ran the DRIVER's 1-h budget out and turned
    // the whole round's artifact into rc=124/"parsed":null). Every query
    // runs on a daemon thread with its own job group; past the budget
    // the group's jobs are cancelled (interruptOnCancel) and the query
    // is recorded as timed-out with its ~budget-sized latency — loud in
    // the per-query map, but the artifact always ships numbers.
    // validated like SPARK_GRAFT_BENCH_REPEAT: a zero would make
    // Thread.join(0) wait forever (silently disabling the watchdog —
    // the exact r8 failure it exists to prevent) and a negative value
    // would make join throw and kill the bench
    val queryBudgetSec: Long = sys.env.get("SPARK_GRAFT_QUERY_BUDGET")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption.filter(_ > 0)
        .orElse { System.err.println(
          s"[bench] bad SPARK_GRAFT_QUERY_BUDGET='$v', using 120"); None })
      .getOrElse(120L)

    // groups whose query thread outlived its budget: cancelJobGroup is
    // NOT sticky — a thread hung in analysis/codegen submits its jobs
    // AFTER the cancel and they would run to completion, polluting
    // every later measurement — so abandoned groups are re-cancelled
    // before each subsequent query starts
    val abandonedGroups = scala.collection.concurrent.TrieMap.empty[String, Unit]

    val groupSeq = new java.util.concurrent.atomic.AtomicLong(0)

    // returns the invocation's job-group id — the key under which
    // groupMetrics accumulated this run's task metrics
    def collectWatched(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                       tag: String): String = {
      abandonedGroups.keysIterator.foreach(spark.sparkContext.cancelJobGroup)
      // unique per INVOCATION: repeat passes re-run the same (tag, name)
      // and an abandoned pass-1 thread must never alias the live pass-2
      // run's group — aliasing would make the sweep either skip its late
      // jobs or kill the legitimate measurement
      val group = s"$tag:$name#${groupSeq.incrementAndGet()}"
      @volatile var err: Option[Throwable] = None
      val t = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(group, s"bench $name", interruptOnCancel = true)
          fn(spark, sfDir).collect(): Unit
        } catch { case e: Throwable => err = Some(e) }
        finally spark.sparkContext.clearJobGroup()
      }, s"bench-$group")
      t.setDaemon(true)
      t.start()
      t.join(queryBudgetSec * 1000)
      if (t.isAlive) {
        spark.sparkContext.cancelJobGroup(group)
        // give cancellation a moment to unwind; a plan hung OUTSIDE job
        // execution (analysis/codegen) won't respond — the daemon thread
        // is abandoned (its group stays on the re-cancel sweep above)
        // and the bench moves on
        t.join(15000)
        if (t.isAlive) abandonedGroups.put(group, ())
        System.err.println(
          s"[bench] $tag $name TIMED OUT after ${queryBudgetSec}s — jobs cancelled")
      } else err.foreach(e =>
        System.err.println(s"[bench] $tag $name failed: ${e.getMessage}"))
      group
    }

    // Dev-only subset filter (comma-separated names), mirroring
    // Verify's SPARK_GRAFT_VERIFY_ONLY; the driver sets no env so its
    // run always times the full surface.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benchQueries = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // Driver GC wall (ms) summed over all collectors — per-query deltas
    // attribute "slow query" vs "query that ran during a GC storm"
    // (r12's nine-query contiguous regression block was exactly that
    // ambiguity: code unchanged, concurrent-mode normal, alphabet-
    // contiguous — a measurement-context effect nobody could attribute
    // because the artifact carried medians only).
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }

    // Context hardening between seq queries (r12 lesson): a sequential
    // pass over 272 queries accumulates dropped localCheckpoint blocks
    // and broadcast variables that only free when a GC cycle lets
    // ContextCleaner see the dead references — left alone, storage
    // fills, MEMORY_AND_DISK blocks spill, and LATER queries pay the
    // eviction I/O inside their timed region (the mechanism behind the
    // alphabet-contiguous r12 regression block). An explicit GC after
    // each query (OUTSIDE the timed region) plus a short beat for the
    // async cleaner keeps every query's starting context identical.
    // SPARK_GRAFT_BENCH_GC=0 disables (A/B lever for PERF.md).
    val gcBetween = sys.env.get("SPARK_GRAFT_BENCH_GC").forall(_.trim != "0")
    def hardenContext(): Unit = if (gcBetween) { System.gc(); Thread.sleep(50) }

    // Per-pass query order is a deterministic SHUFFLE keyed by the pass
    // number, not alphabetical: r12 proved sequential context effects
    // read as alphabet-contiguous regression blocks. Randomizing per
    // pass decorrelates any residual context effect from query name —
    // a median over 5 passes then samples 5 different neighborhoods.
    final case class SeqPass(walls: Map[String, Double], gcs: Map[String, Double],
                             loads: Map[String, Double], cpus: Map[String, Double],
                             runs: Map[String, Double], mems: Map[String, Double])
    def runSeq(pass: Int): SeqPass = {
      val rnd = new scala.util.Random(0x67726166745231L + pass)
      val order = rnd.shuffle(benchQueries.toSeq.sortBy(_._1))
      val walls = Map.newBuilder[String, Double]
      val gcs = Map.newBuilder[String, Double]
      val loads = Map.newBuilder[String, Double]
      val cpus = Map.newBuilder[String, Double]
      val runs = Map.newBuilder[String, Double]
      val mems = Map.newBuilder[String, Double]
      // NOTE (r13 directive 5): clearCache() clears CacheManager
      // entries (df.cache()) only — it does NOT unpersist RDD-level
      // localCheckpoint blocks, and the graft.Memo spine entries hold
      // strong references, so ContextCleaner never collects them
      // either. The memoized dedup spine (signatures→pairs→components)
      // therefore survives both the inter-query clearCache and the
      // per-pass boundary: the ~10 dedup-family queries price the
      // spine build ONCE PER BENCH JVM (whichever family member the
      // shuffled order runs first in pass 1 pays it; every later
      // member and every later pass reads persisted blocks). That is
      // the intended in-session analog of the X61 artifact path.
      order.foreach { case (name, fn) =>
        hardenContext()
        val g0 = gcMs()
        val s0 = System.nanoTime()
        val group = collectWatched(name, fn, "seq")
        spark.catalog.clearCache()
        walls += name -> (System.nanoTime() - s0) / 1e9
        gcs += name -> (gcMs() - g0) / 1e3
        // 1-min load sampled right after the query: the adjudication
        // record for the per-query commit-grade verdict below
        loads += name -> loadAvg()
        // drain the async listener bus BEFORE reading the group's task
        // metrics — the query thread returns when collect() does, often
        // ahead of the last task-end events; an undrained read
        // undercounts. Bounded wait, outside the timed region; a
        // timeout ships a possibly-low number rather than blocking the
        // bench (sequential mode only — under the concurrent phase the
        // bus never drains while 8 queries run, and CPU attribution is
        // a seq-pass artifact anyway).
        org.apache.spark.graftbridge.CoreBridge
          .waitListenerBusEmpty(spark.sparkContext, 10000): Unit
        cpus += name -> groupMetrics.cpuSec(group)
        runs += name -> groupMetrics.runSec(group)
        mems += name -> groupMetrics.peakMemMb(group)
      }
      SeqPass(walls.result(), gcs.result(), loads.result(),
        cpus.result(), runs.result(), mems.result())
    }

    def runConcurrent(): Map[String, Double] = {
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = benchQueries.toSeq.map { case (name, fn) =>
        Future {
          val s0 = System.nanoTime()
          collectWatched(name, fn, "conc")
          name -> (System.nanoTime() - s0) / 1e9
        }
      }
      val r = Await.result(Future.sequence(futures), Duration.Inf).toMap
      pool.shutdown()
      // CacheManager entries (if any query persists) must not leak into
      // the seq pass; localCheckpoint blocks free via ContextCleaner
      // once the per-query frames are unreferenced and GC runs
      spark.catalog.clearCache()
      r
    }

    def js(m: Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    def timed[A](f: () => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f()
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // per-query MEDIAN over repeated seq passes: single-run latencies
    // on a shared host swing ±20-30% with co-tenant load (r5's 32.9 s
    // q_global_rank scare, r6's 18.5-40 s wall spread were both
    // measurement noise) — medians make a regression claim falsifiable.
    // Default is 5 passes (not 1): the artifact the driver ships each
    // round must BE medians without needing an env var set.
    val seqRepeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption
        .orElse { System.err.println(s"[bench] bad SPARK_GRAFT_BENCH_REPEAT='$v', using 5"); None })
      .getOrElse(5).max(1)
    // every pass's full per-query wall AND gc map is kept and shipped in
    // target/bench.json (queries_seq_passes / queries_gc_sec_passes) —
    // the permanent per-pass record the r12 verdict asked for: any
    // future regression-flag dispute is arithmetic over the artifact,
    // not argument about measurement context
    var seqPasses: Seq[Map[String, Double]] = Seq.empty
    var gcPasses: Seq[Map[String, Double]] = Seq.empty
    var loadPasses: Seq[Double] = Seq.empty // load avg sampled at each pass end
    var loadQueryPasses: Seq[Map[String, Double]] = Seq.empty // per-query post-run load
    var cpuPasses: Seq[Map[String, Double]] = Seq.empty // per-query executor CPU sec
    var runPasses: Seq[Map[String, Double]] = Seq.empty // per-query executor task-run sec
    var memPasses: Seq[Map[String, Double]] = Seq.empty // per-query max task peak-exec-mem MB
    def medianBy(runs: Seq[Map[String, Double]]): Map[String, Double] =
      runs.head.keys.map { k =>
        val xs = runs.map(_(k)).sorted
        k -> xs(xs.size / 2)
      }.toMap
    def runSeqMedian(): Map[String, Double] = {
      // per-pass totals to stderr: pass 1 carries every janino compile
      // (cold codegen), passes 2+ measure steady state — the 1-vs-rest
      // gap IS the codegen-cache evidence (PERF.md "codegen class
      // cache"); a warm pass nearly as slow as pass 1 means the 4096-
      // entry cache no longer covers the query surface
      val runs = (1 to seqRepeat).map { i =>
        val p = runSeq(i)
        val r = p.walls
        val la = loadAvg()
        System.err.println(f"[bench] seq pass $i/$seqRepeat total ${r.values.sum}%.1f s (gc ${p.gcs.values.sum}%.1f s, cpu ${p.cpus.values.sum}%.1f s, load $la%.2f)")
        seqPasses :+= r
        gcPasses :+= p.gcs
        loadPasses :+= la
        loadQueryPasses :+= p.loads
        cpuPasses :+= p.cpus
        runPasses :+= p.runs
        memPasses :+= p.mems
        r
      }
      medianBy(runs)
    }
    // Headline value + its explicit kind (ADVICE r7: the semantics must
    // live IN the artifact, not in a code comment):
    //   seq mode        → sum of per-query medians   ("sum_of_seq_medians")
    //   concurrent mode → cold concurrent wall       ("concurrent_wall")
    //   both (default)  → seq-median passes FIRST (they double as the
    //     codegen warm-up), then the concurrent wall — so the headline
    //     measures steady-state workload throughput, not janino compile
    //     storms of 112 cold plans on 8 threads ("concurrent_wall_warm").
    val (results, total, kind, seqResults) = mode match {
      case "seq"        => val r = runSeqMedian(); (r, r.values.sum, "sum_of_seq_medians", Some(r))
      case "concurrent" => val (r, w) = timed(runConcurrent _); (r, w, "concurrent_wall", None)
      case _ =>
        val s = runSeqMedian()
        val (r, w) = timed(runConcurrent _)
        (r, w, "concurrent_wall_warm", Some(s))
    }
    // per-query executor-CPU medians over the same passes — the
    // load-invariant regression column (VERDICT r15 #1)
    val cpuMedians: Option[Map[String, Double]] =
      if (cpuPasses.nonEmpty) Some(medianBy(cpuPasses)) else None
    val memMedians: Option[Map[String, Double]] =
      if (memPasses.nonEmpty) Some(medianBy(memPasses)) else None
    // median-vs-median regression gate: bench_baseline.json (checked in,
    // per-query seq medians of the prior accepted round) → any query
    // whose current median exceeds 2× its baseline is named in the
    // artifact itself. A missing baseline or query is skipped, never
    // fatal — the gate flags regressions, it must not brick the bench.
    //
    // CPU-FIRST ADJUDICATION (VERDICT r15 #1-2): every flagged entry
    // now carries the executor-CPU median against the CPU baseline and
    // a machine verdict — "cpu_regressed" (CPU itself moved >1.5×: the
    // PLAN got more expensive, load cannot explain it) vs "context"
    // (wall inflated but CPU is flat: co-tenant starvation/IO wait —
    // the r14/r15 adjudications that used to take an isolated-probe
    // session each). A query is also flagged on CPU alone (>2× CPU at
    // flat wall = a plan regression hidden by an idle host). Entries
    // without a CPU baseline (pre-r16 artifact) stay "unclassified".
    val cpuBase = BenchBaseline.loadCpu()
    val regressions = (for {
      seq <- seqResults
      base <- BenchBaseline.load()
    } yield {
      val regs = seq.toSeq.sortBy(_._1).flatMap { case (q, t) =>
        val wallReg = base.get(q).exists(b => t > 2.0 * b && t - b > 0.5)
        val cpuM = cpuMedians.flatMap(_.get(q))
        val cpuB = cpuBase.flatMap(_.get(q))
        val cpuReg = (for (m <- cpuM; b <- cpuB)
          yield m > 2.0 * b && m - b > 0.5).getOrElse(false)
        if (!wallReg && !cpuReg) None
        else {
          val clazz = (cpuM, cpuB) match {
            case (Some(m), Some(b)) =>
              if (m > 1.5 * b && m - b > 0.25) "cpu_regressed" else "context"
            case _ => "unclassified"
          }
          val wallB = base.getOrElse(q, -1.0)
          val cm = cpuM.map(m => f"$m%.3f").getOrElse("null")
          val cb = cpuB.map(b => f"$b%.3f").getOrElse("null")
          Some(f""""$q":{"median":$t%.3f,"baseline":$wallB%.3f,"cpu_median":$cm,"cpu_baseline":$cb,"class":"$clazz"}""")
        }
      }
      regs.foreach(r => System.err.println(s"[bench] REGRESSION $r"))
      regs
    }).getOrElse(Seq.empty)
    // STDOUT CONTRACT: one JSON line that must survive a 2000-char tail
    // capture — every BENCH_r01..r09 artifact ships tail_len=2000 and
    // "parsed":null because the full 230-entry per-query map is ~5 KB
    // and ALWAYS loses its head to the clip. Stdout therefore carries
    // the headline totals plus only the SLOWEST queries, greedily
    // packed under a 1600-char line budget (the remaining ~400 chars
    // absorb any logger epilogue that still lands after us); the
    // complete full-precision dual map + named regressions go to
    // target/bench.json where nothing can clip them.
    val (qmap, qkind) = seqResults.map((_, "seq_median")).getOrElse((results, "concurrent"))
    val lineBudget = 1600
    val qsum = qmap.values.sum
    def mkLine(entries: Seq[(String, Double)]): String = {
      val qs = entries.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","value_kind":"$kind","queries":$qs,"queries_kind":"$qkind","n_queries":${qmap.size},"queries_shown":${entries.size},"queries_sum_sec":$qsum%.3f,"seq_repeat":$seqRepeat,"regressions_n":${regressions.size},"load_start":$loadStart%.2f,"commit_grade":$commitGrade,"detail":"target/bench.json","sf":"$sfDir"}"""
    }
    // slowest-first, ties broken by name for a deterministic artifact
    val bySlowest = qmap.toSeq.sortBy { case (k, v) => (-v, k) }
    val shown = (qmap.size to 0 by -1)
      .map(n => bySlowest.take(n))
      .find(e => mkLine(e).length <= lineBudget)
      .getOrElse(Seq.empty)
    println(mkLine(shown))
    def jsArr(ms: Seq[Map[String, Double]]): String =
      ms.map(js).mkString("[", ",", "]")
    val loadEnd = loadAvg()
    val hostCpus = Runtime.getRuntime.availableProcessors()
    val loadJson = loadPasses.map(l => f"$l%.2f").mkString("[", ",", "]")
    // Per-query commit-grade verdict (VERDICT r14 #5): a query's median
    // is commit-grade only when a MAJORITY of its passes ran with the
    // post-query load sample under the pass gate. This converts the
    // "different random subsets flag under load" adjudication from
    // narrative into arithmetic the artifact itself carries; regen
    // refuses to adopt a below-gate query's median as baseline. A
    // negative (unavailable) sample counts as a dirty pass.
    val mediansBelowGate: Seq[String] =
      if (loadQueryPasses.isEmpty) Seq.empty
      else loadQueryPasses.head.keys.toSeq.sorted.filter { q =>
        val clean = loadQueryPasses.count(p =>
          p.get(q).exists(l => l >= 0 && l <= passLoadGate))
        clean < loadQueryPasses.size / 2 + 1
      }
    val mediansCommitGrade =
      loadQueryPasses.headOption.map(_.size - mediansBelowGate.size).getOrElse(0)
    if (mediansBelowGate.nonEmpty) System.err.println(
      s"[bench] ${mediansBelowGate.size} query medians below the per-pass " +
        f"load gate $passLoadGate%.1f (majority of passes dirty) — " +
        "not baseline-adoptable")
    // Memo-build attribution (VERDICT r14 #6): which query paid each
    // memoized spine build, so the seq medians are interpretable.
    val memoBuilds = Memo.buildEvents().map(e =>
      f"""{"memo":"${e.memo}","thread":"${e.thread}","ms":${e.ms}%.1f,"won":${e.won}}""")
      .mkString("[", ",", "]")
    // Per-FAMILY spine economics (VERDICT r16 #2): with once-per-JVM
    // memos, a spine build lands in one pass of one query and the
    // 5-pass median DISCARDS it — Σ of seq medians systematically
    // undercounts the workload by Σ builds, and a rider's "14× win"
    // is partly cost MOVED to a shared build. This block makes the
    // honest number first-class: per memo family, the total build
    // wall actually paid (won + lost races) and the Σ of its riders'
    // steady-state medians, plus a query→memos map so round-over-
    // round tables can separate "plan got faster" from "became a
    // spine rider". Riders are attributed via thread names: Bench's
    // query threads are "bench-seq:<query>#k" and Memo.readEvents
    // strips the "#k", so a seq-pass read maps 1:1 to a query name.
    val riderPrefix = "bench-seq:"
    val memoRiders: Map[String, Seq[String]] = Memo.readEvents()
      .collect { case (m, t) if t.startsWith(riderPrefix) =>
        m -> t.stripPrefix(riderPrefix) }
      .groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).distinct.sorted }
    val buildSecByMemo: Map[String, Double] = Memo.buildEvents()
      .groupBy(_.memo).map { case (m, es) => m -> es.map(_.ms).sum / 1e3 }
    val memoFamilies = (memoRiders.keySet ++ buildSecByMemo.keySet).toSeq.sorted.map { m =>
      val riders = memoRiders.getOrElse(m, Seq.empty)
      val riderSum = seqResults.map(sr =>
        riders.flatMap(sr.get).sum).getOrElse(0.0)
      val rjs = riders.map("\"" + _ + "\"").mkString("[", ",", "]")
      f""""$m":{"build_sec":${buildSecByMemo.getOrElse(m, 0.0)}%.3f,"riders":$rjs,"riders_sum_sec":$riderSum%.3f}"""
    }.mkString("{", ",", "}")
    val queriesMemos = memoRiders.toSeq.flatMap { case (m, qs) => qs.map(_ -> m) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (q, ms) =>
        "\"" + q + "\":" + ms.map("\"" + _._2 + "\"").sorted.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // Effective session config (VERDICT r16 #1: both r16 cg closes
    // predate the AQE revert and the artifact could not say which
    // config they ran — never ambiguous again). Values read back from
    // the LIVE session, not from the env defaults that fed it.
    def conf(k: String): String = scala.util.Try(spark.conf.get(k)).getOrElse("unset")
    val sessionConfig =
      s"""{"master":"local[$cpus]","shuffle_partitions":"${conf("spark.sql.shuffle.partitions")}","aqe_enabled":"${conf("spark.sql.adaptive.enabled")}","aqe_parallelism_first":"${conf("spark.sql.adaptive.coalescePartitions.parallelismFirst")}","aqe_advisory_partition":"${conf("spark.sql.adaptive.advisoryPartitionSizeInBytes")}","codegen_cache_max_entries":"${conf("spark.sql.codegen.cache.maxEntries")}"}"""
    val belowJson = mediansBelowGate.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      f"""{"metric":"total","value":$total,"unit":"sec","value_kind":"$kind","queries_concurrent":${js(results)},"queries_seq":${seqResults.map(js).getOrElse("null")},"queries_seq_passes":${jsArr(seqPasses)},"queries_gc_sec_passes":${jsArr(gcPasses)},"queries_load_passes":${jsArr(loadQueryPasses)},"queries_cpu_seq":${cpuMedians.map(js).getOrElse("null")},"queries_cpu_sec_passes":${jsArr(cpuPasses)},"queries_run_sec_passes":${jsArr(runPasses)},"queries_peakmem_mb":${memMedians.map(js).getOrElse("null")},"queries_peakmem_mb_passes":${jsArr(memPasses)},"gc_between_queries":$gcBetween,"seq_order":"shuffled_per_pass","seq_repeat":$seqRepeat,"regressions":${regressions.mkString("{", ",", "}")},"load_avg_start":$loadStart%.2f,"load_avg_per_pass":$loadJson,"load_avg_end":$loadEnd%.2f,"load_gate":$loadGate%.2f,"pass_load_gate":$passLoadGate%.2f,"medians_commit_grade":$mediansCommitGrade,"medians_below_gate":$belowJson,"memo_builds":$memoBuilds,"memo_families":$memoFamilies,"queries_memos":$queriesMemos,"session_config":$sessionConfig,"commit_grade":$commitGrade,"host_cpus":$hostCpus,"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    // Stamped copy: target/bench.json is overwritten by EVERY Bench
    // invocation, including scoped SPARK_GRAFT_BENCH_ONLY probes — r13
    // lost its best clean close artifact exactly this way (only a 4 KB
    // stdout tail survived). The stamped file makes every run's full
    // artifact durable; stderr names it so the operator can find it.
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd-HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    // commit-grade closes get a "-cg" suffix so retention can budget
    // them separately from probe runs (ADVICE r15: a >24-probe loop
    // used to delete the last commit-grade close — the exact loss mode
    // the stamps were added to prevent)
    val stamped = java.nio.file.Paths.get(
      s"target/bench-$stamp${if (commitGrade) "-cg" else ""}.json")
    java.nio.file.Files.write(stamped, (full + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] artifact also at $stamped" +
      (if (commitGrade) "" else " (NOT commit-grade: host load)"))
    // Bounded stamp retention (ADVICE r14/r15): scoped probe loops
    // would otherwise accumulate stamped artifacts without limit.
    // Probes and commit-grade closes prune on SEPARATE budgets (newest
    // 24 each), so no amount of probing can evict a close artifact;
    // lexicographic = chronological for the fixed-width stamp. The
    // directory stream is closed deterministically (try/finally) —
    // Files.list leaks the handle otherwise.
    def prune(pattern: String): Unit = scala.util.Try {
      import scala.jdk.CollectionConverters._
      val listing = java.nio.file.Files.list(out.getParent)
      val stamps = try listing.iterator().asScala
        .filter(_.getFileName.toString.matches(pattern))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
      stamps.dropRight(24).foreach(java.nio.file.Files.deleteIfExists(_))
    }: Unit
    prune("bench-\\d{8}-\\d{6}\\.json")
    prune("bench-\\d{8}-\\d{6}-cg\\.json")
    spark.stop()
  }
}
