package graft

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Path}

import scala.sys.process._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.{Crawl, PgDdl}

/** Live-PostgreSQL execution of the postgres-dialect bootstrap — the
  * statements that were previously only text-pinned (the sandbox has no
  * JDBC postgresql driver jar and zero egress, so Spark's
  * `df.write.jdbc` leg stays untestable; what CAN run live is
  * everything the reference itself runs through DDL/DML:
  * storcrawl.py:88-215).
  *
  * The spec boots a throwaway single-machine PostgreSQL 15 cluster as
  * the `postgres` OS user on a private unix socket (no TCP, no port
  * conflicts), then:
  *   - executes [[PgDdl.schemaBootstrap]] verbatim and introspects
  *     information_schema for the reference's exact column types
  *     (bytea, bit(19), timestamptz, jsonb, SERIAL→integer+sequence);
  *   - round-trips a hostile row: a non-UTF-8 `bytea` path, a
  *     `bit(19)` mode string, a defaulted `timestamptz`;
  *   - executes [[Crawl.reportingRoleStatements]] and proves the role
  *     is read-only (SELECT succeeds, INSERT is denied) — live
  *     authorization, not just statement text.
  *
  * If the PostgreSQL server binaries are absent the tests cancel
  * (documented environment block), keeping the suite green elsewhere.
  */
object PgLiveSpec {
  /** Poison flag for the exactly-once leg: local-mode executors share
    * the JVM, so one static boolean injects a first-pull-only task
    * failure into a lazily-evaluated partition iterator. */
  val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class PgLiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val pgBin: Option[String] =
    Seq("/usr/lib/postgresql/15/bin", "/usr/lib/postgresql/16/bin",
        "/usr/lib/postgresql/14/bin")
      .find(d => Files.isExecutable(java.nio.file.Paths.get(d, "initdb")))

  private var base: Path = _
  private var up = false
  private val port = 55437 // socket-file suffix only; listen_addresses=''

  /** Run `cmd` as the postgres OS user from /tmp (the JVM's cwd is not
    * accessible to postgres and su would warn onto stderr). Returns
    * (exit, stdout) — assertions parse stdout; stderr only surfaces in
    * failure messages via the combined log. */
  private def sh(cmd: String, stdin: String = ""): (Int, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'), l => err.append(l).append('\n'))
    val p = Process(Seq("su", "postgres", "-c", cmd), new java.io.File("/tmp"))
      .#<(new ByteArrayInputStream(stdin.getBytes("UTF-8")))
    val code = p.!(logger)
    (code, if (code == 0) out.toString else out.toString + err.toString)
  }

  /** Run SQL through psql with ON_ERROR_STOP; returns (exit, output). */
  private def psql(sql: String): (Int, String) =
    sh(s"psql -v ON_ERROR_STOP=1 -h $base -p $port -d postgres -X -q -t -A", sql)

  override def beforeAll(): Unit = {
    super.beforeAll()
    // any bootstrap failure (no postgres OS user, non-root JVM that
    // cannot chown/su, server refuses to start) leaves up=false and
    // the tests CANCEL via live() instead of aborting the suite — the
    // same environment-block contract as absent binaries
    try pgBin.foreach { bin =>
      base = Files.createTempDirectory("graft-pglive")
      require(Seq("chown", "-R", "postgres:postgres", base.toString).! == 0, "chown failed")
      val (i, iOut) = sh(s"$bin/initdb -D $base/data -E UTF8 --no-sync")
      require(i == 0, s"initdb failed:\n$iOut")
      val (s0, sOut) = sh(
        s"""$bin/pg_ctl -D $base/data -o "-k $base -p $port -c listen_addresses=''" -w -l $base/pg.log start""")
      require(s0 == 0, s"pg_ctl start failed:\n$sOut")
      up = true
    } catch {
      case e: Exception =>
        System.err.println(s"[PgLiveSpec] live PG unavailable, tests will cancel: ${e.getMessage}")
    }
  }

  override def afterAll(): Unit = {
    if (up) {
      sh(s"${pgBin.get}/pg_ctl -D $base/data -w -m immediate stop")
      Seq("rm", "-rf", base.toString).!
    }
    super.afterAll()
  }

  private def live(): Unit =
    assume(up, "live PostgreSQL unavailable in this environment (binaries, OS user, or privileges)")

  private val schema = "storcrawl_live"

  /** Execute a (statement, tolerated) bootstrap sequence with the
    * reference's drop-tolerance contract. */
  private def runSeq(stmts: Seq[(String, Boolean)]): Unit =
    stmts.foreach { case (sql, tolerated) =>
      val (code, out) = psql(sql)
      if (!tolerated) assert(code == 0, s"statement failed: $sql\n$out")
    }

  test("schema bootstrap executes verbatim; live catalog shows the reference's types") {
    live()
    runSeq(PgDdl.schemaBootstrap(schema, "postgres"))
    val (c, out) = psql(
      s"""SELECT column_name, data_type, coalesce(character_maximum_length, -1)
         |FROM information_schema.columns
         |WHERE table_schema = '$schema' AND table_name = 'files'
         |ORDER BY ordinal_position""".stripMargin)
    assert(c == 0, out)
    val cols = out.linesIterator.filter(_.nonEmpty)
      .map(_.split('|')).map(a => a(0) -> (a(1), a(2).toInt)).toMap
    assert(cols("path") == (("bytea", -1)))
    assert(cols("extension") == (("bytea", -1)))
    assert(cols("st_mode") == (("bit", 19)))
    assert(cols("insert_time")._1 == "timestamp with time zone")
    assert(cols("id")._1 == "integer") // SERIAL = integer + owned sequence
    val (cs, seqOut) = psql(
      s"SELECT pg_get_serial_sequence('$schema.files', 'id') IS NOT NULL")
    assert(cs == 0 && seqOut.trim == "t", s"SERIAL sequence missing: $seqOut")
    val (ce, entryOut) = psql(
      s"""SELECT data_type FROM information_schema.columns
         |WHERE table_schema = '$schema' AND table_name = 'status'""".stripMargin)
    assert(ce == 0 && entryOut.trim == "jsonb")
  }

  test("hostile row round-trips: non-UTF-8 bytea path, bit(19) mode, timestamptz default") {
    live()
    runSeq(PgDdl.schemaBootstrap(schema, "postgres"))
    // "/tmp/" + 0xff — a path no text column could carry losslessly
    val hex = "2f746d702fff"
    val mode = "0000000100111101101"
    val (i, iOut) = psql(
      s"""INSERT INTO $schema.files
         |  (path, extension, st_mode, st_ino, st_dev, st_nlink,
         |   st_uid, st_gid, st_size, st_atime, st_mtime, st_ctime, owner)
         |VALUES (decode('$hex','hex'), NULL, B'$mode', 42, '2049', 1,
         |        0, 0, 123, 1, 2, 3, NULL)""".stripMargin)
    assert(i == 0, iOut)
    val (s0, out) = psql(
      s"""SELECT id, encode(path,'hex'), st_mode::text,
         |       (insert_time IS NOT NULL)::text
         |FROM $schema.files""".stripMargin)
    assert(s0 == 0, out)
    val row = out.trim.split('|')
    assert(row(0) == "1", "SERIAL id starts at 1")
    assert(row(1) == hex, "bytea path must round-trip byte-exact")
    assert(row(2) == mode, "bit(19) mode must round-trip digit-exact")
    assert(row(3) == "true", "timestamptz DEFAULT now() must fire") // bool::text = 'true'
  }

  test("wire client: simple query, server error recovery, bytea round-trip") {
    live()
    val c = graft.crawl.PgWireClient.connect(base.toString, port, "postgres", "postgres")
    try {
      val r = c.query("SELECT 1 + 1, NULL, 'tab\there'")
      assert(r.rows == Vector(Vector(Some("2"), None, Some("tab\there"))))
      // a server error must throw AND leave the connection usable
      intercept[graft.crawl.PgWireException](c.query("SELECT * FROM no_such_table_xyz"))
      assert(c.query("SELECT 42").rows.head.head.contains("42"))
      // COPY round trip incl. escaping of \t, \n, \\ and bytea hex
      c.query("CREATE TEMP TABLE wt (b bytea, s text)")
      val n = c.copyIn("COPY wt (b, s) FROM STDIN", Iterator(
        graft.crawl.PgCopyText.line(Seq(
          graft.crawl.PgCopyText.bytea(Array(0x00, 0xff, 0x5c).map(_.toByte)),
          graft.crawl.PgCopyText.escape("a\tb\nc\\d"))),
        graft.crawl.PgCopyText.line(Seq(graft.crawl.PgCopyText.Null, "plain"))))
      assert(n == 2L)
      val back = c.query(
        "SELECT encode(b, 'hex'), s FROM wt ORDER BY s NULLS FIRST")
      assert(back.rows == Vector(
        Vector(Some("00ff5c"), Some("a\tb\nc\\d")),
        Vector(None, Some("plain"))))
    } finally c.close()
  }

  test("live Spark write leg: wire COPY sink appends crawl rows to PostgreSQL byte-exact") {
    live()
    runSeq(PgDdl.schemaBootstrap(schema, "postgres"))
    val spark = SparkSpec.session
    // crawl a real tree whose names exercise COPY escaping: tab,
    // newline, backslash, quotes, unicode
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "pgwiretree")
    def touch(name: String, content: String): Unit = {
      val p = root.resolve(name)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes("UTF-8"))
    }
    touch("plain.txt", "hello")
    touch("tab\tname.dat", "t")
    touch("new\nline.log", "n")
    touch("back\\slash'q\".bin", "b")
    touch("sub/ünïcode.gz", "u")
    val files = graft.crawl.Crawl.run(spark, Seq(root.toString))
    val want = files.count()
    assert(want >= 5L)

    val written = Crawl.writeFilesViaWire(
      files, base.toString, port, "postgres", "postgres", schema,
      commitRows = 2, numPartitions = 3) // several batches AND connections
    assert(written == want, "server must acknowledge every row")
    val (c0, cnt) = psql(s"SELECT count(*), count(insert_time) FROM $schema.files")
    assert(c0 == 0, cnt)
    assert(cnt.trim == s"$want|$want", "rowcount + timestamptz default")
    // byte-exact path fidelity through binary cast → COPY → bytea
    val hostile = root.resolve("back\\slash'q\".bin").toString
    val hex = hostile.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    val (c1, got) = psql(
      s"SELECT count(*) FROM $schema.files WHERE encode(path,'hex') = '$hex'")
    assert(c1 == 0 && got.trim == "1", s"hostile path must round-trip: $got")
    // st_mode landed as bit(19) digits; SERIAL ids dense from 1
    val (c2, modes) = psql(
      s"SELECT min(length(st_mode::text)), max(length(st_mode::text)), " +
        s"min(id), max(id) FROM $schema.files")
    assert(c2 == 0 && modes.trim == s"19|19|1|$want", modes)
    // append-only: a second write doubles the count (reference commits
    // incrementally into the same per-tag table)
    Crawl.writeFilesViaWire(files, base.toString, port,
      "postgres", "postgres", schema, commitRows = 1000, numPartitions = 1)
    val (c3, twice) = psql(s"SELECT count(*) FROM $schema.files")
    assert(c3 == 0 && twice.trim == (2 * want).toString)
    // the status jsonb leg (storcrawl.py:302-311)
    val ctrs = Crawl.counters(spark)
    ctrs.filesSeen.add(want); ctrs.dirsSeen.add(3)
    val status = Crawl.statusRows(spark, ctrs, 1700000000L, 1700000060L)
    val ns = Crawl.writeStatusViaWire(
      status, base.toString, port, "postgres", "postgres", schema)
    assert(ns == 8L)
    val (c4, ev) = psql(
      s"""SELECT count(*),
         |  count(*) FILTER (WHERE (entry->>'time')::bigint > 0)
         |FROM $schema.status""".stripMargin)
    assert(c4 == 0 && ev.trim == "8|8", s"jsonb entries must be queryable: $ev")
  }

  test("exactly-once tx sink: a partition killed mid-COPY appends zero duplicates on retry") {
    live()
    val txSchema = "storcrawl_tx"
    runSeq(PgDdl.schemaBootstrap(txSchema, "postgres"))
    val spark = SparkSpec.session
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "pgtxtree")
    (1 to 9).foreach { i =>
      Files.write(root.resolve(f"f$i%02d.txt"), s"content $i".getBytes("UTF-8"))
    }
    val crawled = graft.crawl.Crawl.run(spark, Seq(root.toString))
    val want = crawled.count()
    assert(want >= 9L)

    // Rebuild the frame over a 3-partition RDD with a LAZY poison in
    // the final (result) stage: the marker row THROWS the first time
    // any task pulls it — i.e. while writeFilesViaWireTx's single COPY
    // is mid-stream, after earlier rows of that partition already went
    // down the wire. local[4] has task maxFailures=1, so the job
    // fails; the retry is the whole-write replay with the SAME
    // writeId, which is the identical code path a cluster-mode task
    // retry takes through the ledger (claim-conflict skip for
    // partitions that committed, clean single append for the one the
    // server rolled back).
    val marker = crawled.orderBy("path").select("path")
      .collect().last.getString(0)
    PgLiveSpec.tripped.set(false)
    val rows = crawled.collect().toSeq.sortBy(_.getString(0))
    val poisoned = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3).map { r =>
        if (r.getString(0) == marker &&
            !PgLiveSpec.tripped.getAndSet(true))
          throw new RuntimeException("injected mid-COPY task kill")
        r
      }, crawled.schema)

    val attempt1 = intercept[org.apache.spark.SparkException] {
      Crawl.writeFilesViaWireTx(poisoned, base.toString, port,
        "postgres", "postgres", txSchema, writeId = "w1", numPartitions = 0)
    }
    assert(attempt1.getMessage.contains("injected mid-COPY task kill") ||
      Option(attempt1.getCause).exists(_.getMessage.contains("injected")),
      s"unexpected failure: ${attempt1.getMessage}")
    // the killed partition's open transaction rolled back server-side:
    // whatever landed is exactly what the ledger claims, nothing more
    val (a0, audit) = psql(
      s"""SELECT (SELECT count(*) FROM $txSchema.files) -
         |       (SELECT coalesce(sum(n_rows), 0) FROM $txSchema.write_ledger)""".stripMargin)
    assert(a0 == 0 && audit.trim == "0",
      s"files rows must equal the ledger audit after a mid-COPY kill: $audit")
    val (p0, partial) = psql(s"SELECT count(*) FROM $txSchema.files")
    assert(p0 == 0 && partial.trim.toLong < want,
      "the killed partition must NOT have landed")

    // retry: same frame, same writeId — committed partitions skip via
    // the ledger claim, the rolled-back one appends exactly once
    val appended = Crawl.writeFilesViaWireTx(poisoned, base.toString, port,
      "postgres", "postgres", txSchema, writeId = "w1", numPartitions = 0)
    assert(appended == want - partial.trim.toLong,
      "retry must append exactly the rolled-back partition")
    val (c0, cnt) = psql(s"SELECT count(*) FROM $txSchema.files")
    assert(c0 == 0 && cnt.trim.toLong == want, s"total must be exact: $cnt")
    val (d0, dups) = psql(
      s"SELECT count(*) FROM (SELECT path FROM $txSchema.files " +
        "GROUP BY path HAVING count(*) > 1) d")
    assert(d0 == 0 && dups.trim == "0", s"zero duplicate rows required: $dups")

    // full-write replay (driver retry / re-run of the same logical
    // write): every partition's claim conflicts, nothing is appended
    val replay = Crawl.writeFilesViaWireTx(poisoned, base.toString, port,
      "postgres", "postgres", txSchema, writeId = "w1", numPartitions = 0)
    assert(replay == 0L, "idempotent replay must append nothing")
    val (r0, rcnt) = psql(s"SELECT count(*) FROM $txSchema.files")
    assert(r0 == 0 && rcnt.trim.toLong == want)
    // and the ledger audit still reconciles the table exactly
    val (l0, ledger) = psql(
      s"SELECT sum(n_rows), count(*) FROM $txSchema.write_ledger")
    assert(l0 == 0 && ledger.trim == s"$want|3", s"ledger audit: $ledger")
  }

  test("reporting role bootstrap: live SELECT granted, INSERT denied") {
    live()
    runSeq(PgDdl.schemaBootstrap(schema, "postgres"))
    runSeq(Crawl.reportingRoleStatements(
      "postgres", schema, "postgres", "crawlreport", "s3cret"))
    val (sel, selOut) = psql(
      s"SET ROLE crawlreport;\nSELECT count(*) FROM $schema.files;")
    assert(sel == 0, s"read-only role must SELECT:\n$selOut")
    val (ins, insOut) = psql(
      s"""SET ROLE crawlreport;
         |INSERT INTO $schema.files
         |  (path, st_mode, st_ino, st_dev, st_nlink, st_uid, st_gid,
         |   st_size, st_atime, st_mtime, st_ctime)
         |VALUES (decode('00','hex'), B'${"0" * 19}', 1, '1', 1, 0, 0,
         |        0, 0, 0, 0)""".stripMargin)
    assert(ins != 0, "read-only role must NOT insert")
    assert(insOut.contains("permission denied"), s"unexpected denial text:\n$insOut")
  }
}
