package graft.crawl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The wired crawl pipeline (storcrawl.py begin_scan, :530-636):
  * roots → recursive listing (S1) → lstat enrich + extension (S2/F2) →
  * owner attribution (J1) → sink (S4), one lazily-pipelined Spark job —
  * the reference's walker/stater/dbproc pools with their three shutdown
  * barriers collapse into Spark stage pipelining (SURVEY.md §3.1).
  *
  * Counters (A1, storcrawl.py:72-79) are lock-free LongAccumulators
  * merged at task end, replacing the reference's two global
  * multiprocessing locks — its single biggest contention point.
  */
final case class CrawlCounters(
    filesSeen: LongAccumulator,
    dirsSeen: LongAccumulator,
    totalSize: LongAccumulator,
    statErrors: LongAccumulator)

object Crawl {

  /** The DSv2 crawl source options, shared verbatim by the batch read
    * ([[run]]) and the streaming read ([[streamToParquet]]) so the two
    * paths cannot silently diverge on reader configuration. */
  private[crawl] def crawlSourceOptions(
      roots: Seq[String],
      exclusions: Set[String],
      ctrs: Option[CrawlCounters],
      oversubscribe: Option[Int]): Map[String, String] =
    Map(
      "roots" -> roots.mkString(","),
      "exclusions" -> exclusions.mkString(",")) ++
      oversubscribe.map(o => "oversubscribe" -> o.toString) ++
      ctrs.map(c => "countersToken" -> CrawlFsSource.registerCounters(c))

  def counters(spark: SparkSession): CrawlCounters = CrawlCounters(
    spark.sparkContext.longAccumulator("files_seen"),
    spark.sparkContext.longAccumulator("dirs_seen"),
    spark.sparkContext.longAccumulator("total_size"),
    spark.sparkContext.longAccumulator("stat_errors"))

  /** Crawl roots into a `files` DataFrame (FIXTURES.md §2.3 schema).
    * Pass an owners file to attribute PIs; `useJoinPlan` switches the
    * J1 implementation between broadcast-UDF walk and explode+join.
    * The default path is the DataSource V2 provider (one distributed
    * scan, driver does only a shallow oversubscribed expansion);
    * `useV2Source = false` falls back to the level-by-level BFS
    * pipeline — a debugging path whose per-level frontier collects to
    * the driver, fine for small trees only. */
  def run(
      spark: SparkSession,
      roots: Seq[String],
      ownersFile: Option[String] = None,
      exclusions: Set[String] = FsScanner.DefaultExclusions,
      useJoinPlan: Boolean = false,
      ctrs: Option[CrawlCounters] = None,
      useV2Source: Boolean = true,
      oversubscribe: Option[Int] = None): DataFrame = {
    import spark.implicits._
    if (useV2Source) {
      // counters ride INSIDE the scan (token → accumulator bridge,
      // CrawlFsSource.registerCounters): they tick live per entry with
      // zero plan impact — a driver-side counting map here was measured
      // at ~35% crawl throughput (row de/serialization + broken
      // codegen over the scan)
      val raw = spark.read.format("graft.crawl.CrawlFsProvider")
        .options(crawlSourceOptions(roots, exclusions, ctrs, oversubscribe))
        .load()
      val df = raw
        .drop("name", "is_dir", "is_symlink")
        .withColumn("owner", lit(null).cast("string"))
        .withColumn("insert_time", current_timestamp())
      return ownersFile match {
        case None => df
        case Some(of) =>
          val dim = Owners.load(spark, of)
          if (useJoinPlan) {
            // the join plan references the crawl twice; cache AND
            // materialize before handing it to the two join branches —
            // a lazily-populated cache lets Spark schedule both scan
            // stages concurrently, computing partitions twice and
            // (with counters on) double-bumping every accumulator.
            // The cache lives until the session drops it (LRU) or the
            // caller clears; it is the price of the two-branch plan.
            val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            cached.count() // populate + bump counters exactly once
            Owners.attachOwnersByJoin(cached.drop("owner"), dim)
              .withColumnRenamed("owner_joined", "owner")
          } else df.withColumn("owner", Owners.findOwnerUdf(spark, dim))
      }
    }
    val entries = FsScanner.scan(spark, roots, exclusions)
    val counted = ctrs match {
      case Some(c) =>
        entries.map { e =>
          if (e.isDir) c.dirsSeen.add(1) else c.filesSeen.add(1)
          e
        }
      case None => entries
    }
    val meta = StatEnricher.enrich(counted)
    val withSize = ctrs match {
      case Some(c) =>
        meta.map { m =>
          m.st_size.foreach(c.totalSize.add)
          if (m.error.isDefined) c.statErrors.add(1)
          m
        }
      case None => meta
    }
    val df = withSize.toDF().withColumn("insert_time", current_timestamp())
    ownersFile match {
      case None => df
      case Some(of) =>
        val dim = Owners.load(spark, of)
        if (useJoinPlan) {
          // the join plan references the crawl twice (explode side +
          // join-back side); cache AND materialize so neither branch
          // re-lists/re-stats and the accumulators bump exactly once
          // even when Spark schedules both scan stages concurrently
          val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cached.count()
          Owners.attachOwnersByJoin(cached.drop("owner"), dim)
            .withColumnRenamed("owner_joined", "owner")
        } else
          df.withColumn("owner", Owners.findOwnerUdf(spark, dim))
    }
  }

  /** Final one-line summary (storcrawl.py:641). */
  def summary(c: CrawlCounters): String = {
    val tb = c.totalSize.value.toDouble / math.pow(1024, 4)
    f"crawl complete: $tb%.4f TB, ${c.filesSeen.value} files, " +
      f"${c.dirsSeen.value} dirs, ${c.statErrors.value} stat errors"
  }

  /** S4 — parquet sink (the oracle-harness sink; storage namespace per
    * crawl tag like the per-crawl Postgres schema, storcrawl.py:59). */
  def writeParquet(df: DataFrame, baseDir: String, tag: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/crawl_tag=$tag")

  /** T4 — continuous incremental crawl to parquet: the streaming form
    * of the batch crawl (first micro-batch = snapshot, then only
    * entries whose change time entered the new offset window — see
    * [[CrawlFsMicroBatchStream]]). `once = true` drains what is
    * currently available and stops (Trigger.AvailableNow); otherwise
    * re-crawls every `intervalSec`. Checkpointed: restarts resume from
    * the committed watermark, never re-emitting processed windows. */
  def streamToParquet(
      spark: SparkSession,
      roots: Seq[String],
      exclusions: Set[String],
      baseDir: String,
      tag: String,
      intervalSec: Int = 60,
      once: Boolean = false,
      watermarkLagSec: Long = CrawlFsSource.DefaultWatermarkLagSec,
      ctrs: Option[CrawlCounters] = None,
      oversubscribe: Option[Int] = None,
      ownersFile: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = spark.readStream.format("graft.crawl.CrawlFsProvider")
      .options(crawlSourceOptions(roots, exclusions, ctrs, oversubscribe))
      .option("watermarkLagSec", watermarkLagSec.toString)
      .load()
    // owner attribution works in streaming exactly as in the batch
    // UDF path: a stateless longest-ancestor walk over the broadcast
    // owners dimension (the explode+join plan stays batch-only — a
    // stream-static join per micro-batch would re-shuffle each delta)
    val df = ownersFile match {
      case None => raw
      case Some(of) =>
        raw.withColumn("owner", Owners.findOwnerUdf(spark, Owners.load(spark, of)))
    }
    df.writeStream.format("parquet")
      .option("path", s"$baseDir/crawl_stream_tag=$tag")
      .option("checkpointLocation", s"$baseDir/crawl_stream_ckpt_$tag")
      .trigger(
        if (once) Trigger.AvailableNow()
        else Trigger.ProcessingTime(s"$intervalSec seconds"))
      .start()
  }

  /** T1 — the status time series for a finished batch crawl, in the
    * flat legacy schema the report layer queries (SURVEY.md §1.3/A11):
    * begin/end events (units='event', storcrawl.py:575,629) plus final
    * counter gauges and run-average rates (storcrawl.py:494-521). The
    * live streaming variant is graft.streaming.StatusStream. */
  def statusRows(
      spark: SparkSession,
      c: CrawlCounters,
      t0Epoch: Long,
      t1Epoch: Long): DataFrame = {
    import spark.implicits._
    val elapsed = math.max(1L, t1Epoch - t0Epoch).toDouble
    val metrics = Seq(
      ("begin", 0.0, "event", t0Epoch),
      ("files seen", c.filesSeen.value.toDouble, "files", t1Epoch),
      ("dirs seen", c.dirsSeen.value.toDouble, "dirs", t1Epoch),
      ("total size", c.totalSize.value.toDouble, "bytes", t1Epoch),
      ("stat errors", c.statErrors.value.toDouble, "files", t1Epoch),
      ("file rate", c.filesSeen.value / elapsed, "files/sec", t1Epoch),
      ("dir rate", c.dirsSeen.value / elapsed, "dirs/sec", t1Epoch),
      ("end", 0.0, "event", t1Epoch))
    metrics.zipWithIndex.map { case ((status, v, units, t), i) =>
      StatusRow(i.toLong + 1, new java.sql.Timestamp(t * 1000), status, v, units)
    }.toDF()
  }

  def writeStatus(df: DataFrame, baseDir: String, tag: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/status_tag=$tag")

  /** F7 — the reference's CURRENT status-writer shape: one jsonb blob
    * per snapshot, `{"<metric>": {"value": v, "units": u}, "time": t}`
    * (storcrawl.py:303-311,494-521). Kept as a to_json projection over
    * the flat rows (the flat schema stays primary — decision A11). */
  def statusJsonb(status: DataFrame): DataFrame =
    status.select(
      col("id"),
      to_json(struct(
        col("status"), col("value"), col("units"),
        unix_timestamp(col("time")).as("time"))).as("entry"))

  /** F12/S5 analog — the reference's crawl tag stamp
    * (time.strftime('%Y%m%d%H%M%S'), storcrawl.py:58). */
  def defaultTag(nowMillis: Long = System.currentTimeMillis()): String = {
    val fmt = new java.text.SimpleDateFormat("yyyyMMddHHmmss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    fmt.format(new java.util.Date(nowMillis))
  }

  /** S7 — existence check on the per-tag namespace (report.py:56-66:
    * error unless exactly the schema exists). */
  def tagExists(spark: SparkSession, baseDir: String, tag: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$baseDir/crawl_tag=$tag")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S4 — JDBC sink shape (batched inserts, storcrawl.py:314-417):
    * `batchsize` ↔ commit batching, `numPartitions` ↔ --injects. Not
    * exercised in tests (no DB in the container); the call shape is the
    * engine contract. */
  def writeJdbc(
      df: DataFrame, url: String, table: String,
      user: String, password: String,
      batchSize: Int = 10000, numPartitions: Int = 4): Unit = {
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    df.repartition(numPartitions)
      .write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  /** The reference's full database sink path (storcrawl.py:88-165 +
    * 314-417): bootstrap the per-crawl schema with the reference's
    * typed DDL, append the files rows, and insert the status stream as
    * jsonb blobs — one call from a crawl DataFrame to a queryable
    * database. `dialect` keys the DDL type mapping ("postgres" emits
    * the reference's types verbatim; "derby" is the tested embedded
    * analog). Returns bootstrap errors (empty = clean). */
  def writeJdbcFull(
      files: DataFrame,
      status: DataFrame,
      url: String, schema: String,
      user: String, password: String,
      dialect: String = "postgres",
      batchSize: Int = 10000, numPartitions: Int = 4): Seq[(String, String)] = {
    val conn = java.sql.DriverManager.getConnection(url,
      new java.util.Properties() {
        if (user.nonEmpty) { setProperty("user", user); setProperty("password", password) }
      })
    val errs =
      try bootstrapReportingRole(conn, PgDdl.schemaBootstrap(schema, dialect))
      finally conn.close()
    if (errs.isEmpty) {
      // column subset/order of the reference's INSERT (storcrawl.py:330-345);
      // id is the database's identity column; paths/extensions go as
      // BYTES (bytea / FOR BIT DATA — the reference's byte-faithful
      // contract; a no-op when the crawl ran with pathMode=binary).
      // For live Postgres, append `?stringtype=unspecified` to the URL
      // so the driver lets the server coerce st_mode→bit(19) and
      // entry→jsonb from text parameters.
      // the DDL pins stats NOT NULL (reference contract), so stat-error
      // rows cannot land in the database — report what the parquet sink
      // has that this one will not, instead of silently diverging. One
      // aggregation job for the diagnostic; callers pass a materialized
      // table (CrawlMain reads back the written parquet), a live crawl
      // DataFrame would be re-executed by this scan plus the write.
      val diag = files.agg(
        count(when(col("st_mode").isNull, 1)).as("nulls")).head()
      val dropped = diag.getLong(0)
      if (dropped > 0)
        System.err.println(
          s"[jdbc] $dropped stat-error row(s) excluded from $schema.files " +
            "(NOT NULL stat columns, storcrawl.py:132-148); " +
            "they remain in the parquet sink")
      // column names stay lowercase for every dialect: Spark's JDBC
      // append resolves DataFrame columns against the live table's
      // schema case-insensitively before quoting (proven in-repo by the
      // streaming sink's lowercase 'entry' landing in Derby's ENTRY)
      val fileRows = fileSinkColumns(files)
      // quote the schema exactly as the bootstrap DDL did — a name
      // quoteIdent had to protect (mixed case, hyphens) must reach the
      // INSERT identically or it case-folds/errors
      val q = PgDdl.quoteIdent(schema)
      writeJdbc(fileRows, url, s"$q.files", user, password,
        batchSize, numPartitions)
      writeJdbc(statusJsonb(status).select("entry"),
        url, s"$q.status", user, password, batchSize, numPartitions = 1)
    }
    errs
  }

  /** The reference's column subset/order for the files INSERT
    * (storcrawl.py:330-345), shared by the JDBC and wire sinks. */
  private def fileSinkColumns(files: DataFrame): DataFrame =
    files.filter(col("st_mode").isNotNull)
      .select(
        col("path").cast("binary").as("path"),
        col("extension").cast("binary").as("extension"),
        col("st_mode"), col("st_ino"), col("st_dev"), col("st_nlink"),
        col("st_uid"), col("st_gid"), col("st_size"),
        col("st_atime"), col("st_mtime"), col("st_ctime"), col("owner"))

  /** S4's live PostgreSQL write leg via [[PgWireClient]] — the
    * reference's db_process (storcrawl.py:314-417) re-expressed
    * Spark-first: each partition opens one server connection over the
    * cluster's Unix socket and streams its rows through
    * `COPY … FROM STDIN`, committing every `commitRows` rows (the
    * reference's timed-commit cadence, T2, keyed by row count so the
    * contract is deterministic and testable). COPY is the genuinely
    * faster shape at scale — one wire message per ~64 KiB of rows
    * versus the reference's one INSERT round trip per FILE — while
    * keeping its semantics: bytea paths byte-exact, bit(19) modes,
    * append-only, per-batch atomicity.
    *
    * Rows with NULL stats are excluded exactly as [[writeJdbcFull]]
    * does (the DDL pins them NOT NULL). Returns the count of rows the
    * server acknowledged (sum of `COPY n` tags via accumulator).
    *
    * Delivery contract: AT-LEAST-ONCE, same as the reference's
    * db_process (INSERT loop with timed commits, no idempotence key,
    * storcrawl.py:366-383). A Spark task that fails AFTER some batch
    * commits re-runs its whole partition and re-appends the committed
    * batches — the files table is append-only with no unique key, so
    * nothing deduplicates them; the accumulator counts only the
    * attempt that reached each `COPY n` tag, so on retry the returned
    * count can UNDERSTATE table rows (never overstate). Callers must
    * treat `written` as a lower bound, not an equality check, whenever
    * task retries are possible. For exactly-once use
    * [[writeFilesViaWireTx]] (one ledger-guarded transaction per
    * task, built r13); this micro-batch form stays the default
    * because its commit cadence IS the T2 contract PgLiveSpec pins.
    *
    * On a real cluster each executor connects to the database host
    * (swap the Unix socket for TCP, or use [[writeJdbc]] with the
    * standard driver); `numPartitions` bounds the connection count the
    * same way the reference's --injects bounds its writer processes. */
  def writeFilesViaWire(
      files: DataFrame,
      socketDir: String, port: Int,
      user: String, database: String, schema: String,
      commitRows: Int = 10000,
      numPartitions: Int = 4): Long = {
    val rows = fileSinkColumns(files).repartition(numPartitions)
    val cols = rows.columns.toSeq
    val q = PgDdl.quoteIdent(schema)
    val copySql =
      s"COPY $q.files (${cols.mkString(", ")}) FROM STDIN"
    val written = rows.sparkSession.sparkContext.longAccumulator("pg_rows_written")
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val c = PgWireClient.connect(socketDir, port, user, database)
        try it.grouped(commitRows).foreach { batch =>
          c.query("BEGIN")
          val n = c.copyIn(copySql, batch.iterator.map(encodeCopyRow))
          c.query("COMMIT")
          written.add(n)
        } finally c.close()
      }
    }
    written.value
  }

  /** EXACTLY-ONCE wire sink: one ledger-guarded transaction per task
    * (the design [[writeFilesViaWire]]'s delivery contract names; r12
    * verdict asked for it built). Each partition runs a single
    * transaction containing (a) a claim INSERT into a
    * `(write_id, partition_id)`-keyed ledger table with
    * `ON CONFLICT DO NOTHING` and (b) ONE `COPY` of the whole
    * partition — so the data rows and the claim commit atomically.
    * Every failure mode lands on the right side of the fence:
    *
    *  - task dies MID-COPY (or any time before COMMIT): the server
    *    aborts the open transaction — zero rows land; the retry's
    *    claim succeeds and appends the partition once;
    *  - task dies AFTER COMMIT but before reporting success (the
    *    commit-vs-report race the at-least-once form documents): the
    *    retry's claim INSERT hits the ledger's primary key, inserts
    *    nothing, and the retry SKIPS — the committed rows stand,
    *    nothing duplicates;
    *  - speculative twin attempts: the ledger row is the arbiter —
    *    first committer wins, the other blocks on the key then skips.
    *
    * `writeId` identifies the logical write (one id per
    * DataFrame-write; retries of its tasks share it) — reusing an id
    * against the same ledger makes the whole write idempotent, which
    * is exactly the replay contract a restarted 100 TB crawl wants.
    * The ledger is per-schema, bootstrapped here (idempotent DDL),
    * and records the acknowledged `COPY n` per partition, so
    * `SELECT sum(n_rows)` audits the write independently of Spark
    * accumulators (which under-count replayed skips by design).
    *
    * Trade-off vs the micro-batch form: one transaction per
    * partition means the server holds the whole partition's rows
    * uncommitted (normal PG bloat math applies) and the T2
    * incremental-visibility cadence is lost — which is why this is
    * the OPTION, not the default. PgLiveSpec proves both failure
    * leg semantics against a live PG 15 with real task retries. */
  def writeFilesViaWireTx(
      files: DataFrame,
      socketDir: String, port: Int,
      user: String, database: String, schema: String,
      writeId: String,
      numPartitions: Int = 4): Long = {
    // numPartitions <= 0 keeps the caller's partitioning — the replay
    // contract REQUIRES a stable row→partition map across retries of
    // the same writeId, so a caller that already partitioned its frame
    // deterministically must be able to opt out of the extra exchange
    val proj = fileSinkColumns(files)
    val rows = if (numPartitions > 0) proj.repartition(numPartitions) else proj
    val cols = rows.columns.toSeq
    val q = PgDdl.quoteIdent(schema)
    val copySql = s"COPY $q.files (${cols.mkString(", ")}) FROM STDIN"
    val wid = writeId.replace("'", "''")
    locally { // ledger bootstrap: idempotent, driver-side, own txn
      val c = PgWireClient.connect(socketDir, port, user, database)
      try c.query(
        s"""CREATE TABLE IF NOT EXISTS $q.write_ledger (
           |  write_id     text   NOT NULL,
           |  partition_id int    NOT NULL,
           |  n_rows       bigint NOT NULL,
           |  PRIMARY KEY (write_id, partition_id))""".stripMargin): Unit
      finally c.close()
    }
    val written = rows.sparkSession.sparkContext.longAccumulator("pg_rows_written_tx")
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val c = PgWireClient.connect(socketDir, port, user, database)
      try {
        c.query("BEGIN"): Unit
        val claim = c.query(
          s"INSERT INTO $q.write_ledger (write_id, partition_id, n_rows) " +
            s"VALUES ('$wid', $pid, 0) ON CONFLICT DO NOTHING")
        if (claim.tag == "INSERT 0 0") {
          // a prior attempt of THIS (write, partition) already
          // committed — its rows stand; appending again would be the
          // exact duplicate the ledger exists to prevent
          c.query("ROLLBACK"): Unit
        } else {
          val n = c.copyIn(copySql, it.map(encodeCopyRow))
          c.query(s"UPDATE $q.write_ledger SET n_rows = $n " +
            s"WHERE write_id = '$wid' AND partition_id = $pid"): Unit
          c.query("COMMIT"): Unit
          written.add(n)
        }
      } finally c.close()
    }
    written.value
  }

  /** Status snapshots (jsonb blobs, storcrawl.py:302-311) through the
    * same wire path; single small frame, one connection. */
  def writeStatusViaWire(
      status: DataFrame,
      socketDir: String, port: Int,
      user: String, database: String, schema: String): Long = {
    val q = PgDdl.quoteIdent(schema)
    val rows = statusJsonb(status).select("entry").coalesce(1)
    val written = rows.sparkSession.sparkContext.longAccumulator("pg_status_written")
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val c = PgWireClient.connect(socketDir, port, user, database)
        try {
          c.query("BEGIN")
          val n = c.copyIn(s"COPY $q.status (entry) FROM STDIN",
            it.map(encodeCopyRow))
          c.query("COMMIT")
          written.add(n)
        } finally c.close()
      }
    }
    written.value
  }

  /** One COPY text line from a Row, encoding by runtime type: binary →
    * bytea hex, strings COPY-escaped, numbers verbatim, null → \N. */
  private def encodeCopyRow(r: org.apache.spark.sql.Row): String =
    PgCopyText.line((0 until r.length).map { i =>
      if (r.isNullAt(i)) PgCopyText.Null
      else r.get(i) match {
        case b: Array[Byte] => PgCopyText.bytea(b)
        case s: String      => PgCopyText.escape(s)
        case other          => other.toString
      }
    })

  /** S5 remainder — reporting-role bootstrap (storcrawl.py:166-215):
    * drop and recreate a read-only reporting principal, then grant it
    * SELECT over the per-tag namespace. Each element is (statement,
    * isDropPhase).
    *
    * `postgres` emits the reference's statement sequence verbatim
    * (DROP OWNED BY → DROP USER → CREATE USER → CONNECT/USAGE/
    * SELECT-ALL grants). `standard` expresses the same contract in
    * SQL:2003 role form — CREATE ROLE + per-table SELECT grants +
    * role-to-user grants — which embedded Derby executes, so the
    * bootstrap is actually TESTED against a real authorization engine
    * (the reference never tests its own, storcrawl.py has no tests). */
  def reportingRoleStatements(
      dialect: String, schema: String, dbName: String,
      user: String, pass: String,
      tables: Seq[String] = Seq("files", "status"),
      grantees: Seq[String] = Nil): Seq[(String, Boolean)] = {
    // values arrive from layered rc/env config, so they are
    // operator-controlled text: quote identifiers that are not safe
    // barewords and escape the password literal — the reference
    // interpolates raw (storcrawl.py:185), a quirk NOT worth porting
    val u = PgDdl.quoteIdent(user)
    val sch = PgDdl.quoteIdent(schema)
    val p = PgDdl.quoteLiteral(pass)
    dialect match {
      case "postgres" => Seq(
        (s"DROP OWNED BY $u", true),
        (s"DROP USER IF EXISTS $u", true),
        (s"CREATE USER $u WITH ENCRYPTED PASSWORD '$p'", false),
        (s"""GRANT CONNECT ON DATABASE "${dbName.replace("\"", "\"\"")}" TO $u""", false),
        (s"GRANT USAGE ON SCHEMA $sch TO $u", false),
        (s"GRANT SELECT ON ALL SEQUENCES IN SCHEMA $sch TO $u", false),
        (s"GRANT SELECT ON ALL TABLES IN SCHEMA $sch TO $u", false))
      case "standard" =>
        Seq((s"DROP ROLE $u", true), (s"CREATE ROLE $u", false)) ++
          tables.map(t => (s"GRANT SELECT ON $sch.${PgDdl.quoteIdent(t)} TO $u", false)) ++
          grantees.map(g => (s"GRANT $u TO ${PgDdl.quoteIdent(g)}", false))
      case other => sys.error(s"unknown dialect: $other (postgres|standard)")
    }
  }

  /** Execute a bootstrap sequence statement-by-statement. Drop-phase
    * errors are tolerated (the principal may not exist yet — the
    * reference sys.exit(1)s even on a first run's DROP OWNED BY, a
    * quirk we deliberately soften so first runs bootstrap cleanly);
    * create/grant-phase errors are collected and returned. */
  def bootstrapReportingRole(
      conn: java.sql.Connection,
      statements: Seq[(String, Boolean)]): Seq[(String, String)] = {
    val errors = Seq.newBuilder[(String, String)]
    statements.foreach { case (sql, dropPhase) =>
      val st = conn.createStatement()
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException if dropPhase =>
          System.err.println(s"[bootstrap] ignoring drop-phase error: ${e.getMessage}")
        case e: java.sql.SQLException =>
          errors += (sql -> e.getMessage)
      } finally st.close()
    }
    errors.result()
  }
}
