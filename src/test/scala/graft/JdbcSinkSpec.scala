package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.crawl.{Crawl, PgDdl}

/** S4 — the JDBC sink (the reference's primary sink,
  * storcrawl.py:314-417) exercised end-to-end against embedded Derby:
  * crawl a fixture tree, append via writeJdbc (batched, numPartitions =
  * the reference's --injects), read back through spark.read.jdbc and
  * compare row sets. */
class JdbcSinkSpec extends SparkSpec {

  test("writeJdbc round-trips crawl rows through a real database") {
    val root = new CrawlSpec().mkTree()
    val df = Crawl.run(spark, Seq(root.toString))
      .select("path", "extension", "st_size", "st_mtime") // stable subset
    val dbDir = Files.createTempDirectory(Paths.get("target"), "derby")
    val url = s"jdbc:derby:$dbDir/crawldb;create=true"

    Crawl.writeJdbc(df, url, "files", user = "app", password = "app",
      batchSize = 100, numPartitions = 4)

    val props = new java.util.Properties()
    props.setProperty("user", "app")
    props.setProperty("password", "app")
    val back = spark.read.jdbc(url, "files", props)
    assert(back.count() == df.count())
    val wantPaths = df.select("path").collect().map(_.getString(0)).toSet
    val gotPaths = back.select("path").collect().map(_.getString(0)).toSet
    assert(gotPaths == wantPaths)
    // append mode really appends (the reference commits incrementally)
    Crawl.writeJdbc(df, url, "files", user = "app", password = "app")
    assert(spark.read.jdbc(url, "files", props).count() == 2 * df.count())
  }

  test("postgres DDL text matches the reference's types verbatim") {
    val files = PgDdl.filesTableDdl("storcrawl_t1")
    // the reference's files DDL, storcrawl.py:132-148
    assert(files ==
      """CREATE TABLE storcrawl_t1.files(
        |  id SERIAL,
        |  insert_time timestamp with time zone DEFAULT now () NOT NULL,
        |  path bytea NOT NULL,
        |  extension bytea,
        |  st_mode bit(19) NOT NULL,
        |  st_ino bigint NOT NULL,
        |  st_dev text NOT NULL,
        |  st_nlink int NOT NULL,
        |  st_uid bigint NOT NULL,
        |  st_gid bigint NOT NULL,
        |  st_size bigint NOT NULL,
        |  st_atime bigint NOT NULL,
        |  st_mtime bigint NOT NULL,
        |  st_ctime bigint NOT NULL,
        |  owner text)""".stripMargin)
    assert(PgDdl.statusTableDdl("storcrawl_t1").contains("entry jsonb NOT NULL"))
    val seq = PgDdl.schemaBootstrap("storcrawl_t1").map(_._1)
    assert(seq.head == "DROP SCHEMA IF EXISTS storcrawl_t1 CASCADE")
    assert(seq(1) == "CREATE SCHEMA storcrawl_t1")
    assert(seq(2) == "SET search_path TO storcrawl_t1")
    assert(seq(3) == "DROP TABLE IF EXISTS storcrawl_t1.files")
    assert(seq(4) == "DROP TABLE IF EXISTS storcrawl_t1.status")
    // drop-phase statements are the tolerated ones, creates are fatal
    assert(PgDdl.schemaBootstrap("storcrawl_t1").map(_._2) ==
      Seq(true, false, false, true, true, false, false))
    // hostile identifiers are quoted instead of interpolated raw
    assert(PgDdl.filesTableDdl("Bad-Schema").startsWith("CREATE TABLE \"Bad-Schema\".files("))
  }

  test("Spark JDBC dialect sends bytea paths and timestamptz to postgres") {
    import org.apache.spark.sql.types._
    val d = PgDdl.PgCrawlDialect
    assert(d.canHandle("jdbc:postgresql://host/db"))
    assert(!d.canHandle("jdbc:derby:whatever"))
    assert(d.getJDBCType(BinaryType).get.databaseTypeDefinition == "BYTEA")
    assert(d.getJDBCType(TimestampType).get.databaseTypeDefinition ==
      "TIMESTAMP WITH TIME ZONE")
    assert(d.getJDBCType(StringType).isEmpty) // defer to Spark's default
  }

  test("writeJdbcFull: bootstrap + files + status land in one call (derby)") {
    val root = new CrawlSpec().mkTree()
    val ctrs = Crawl.counters(spark)
    val files = Crawl.run(spark, Seq(root.toString), ctrs = Some(ctrs))
    val n = files.filter(org.apache.spark.sql.functions.col("st_mode").isNotNull).count()
    val status = Crawl.statusRows(spark, ctrs, 1000L, 1010L)
    val dbDir = Files.createTempDirectory(Paths.get("target"), "derbyfull")
    val url = s"jdbc:derby:$dbDir/fulldb;create=true"

    val errs = Crawl.writeJdbcFull(files, status, url, "crawl_full",
      user = "", password = "", dialect = "derby")
    assert(errs.isEmpty, s"bootstrap errors: $errs")

    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT COUNT(*) FROM crawl_full.files")
      rs.next(); assert(rs.getLong(1) == n)
      // byte-faithful path column: the unicode fixture file round-trips
      val rs2 = conn.createStatement()
        .executeQuery("SELECT path FROM crawl_full.files")
      val paths = Iterator.continually(rs2)
        .takeWhile(_.next()).map(r => new String(r.getBytes(1), "UTF-8")).toSet
      assert(paths.contains(root.resolve("projA/ünïcode fïle.txt").toString))
      // status landed as one jsonb-shaped blob per metric row
      val rs3 = conn.createStatement()
        .executeQuery("SELECT entry FROM crawl_full.status")
      val entries = Iterator.continually(rs3)
        .takeWhile(_.next()).map(_.getString(1)).toVector
      assert(entries.size == status.count())
      assert(entries.exists(_.contains("\"files seen\"")))
    } finally conn.close()
  }

  test("schema bootstrap executes and round-trips on a live database (derby)") {
    val dbDir = Files.createTempDirectory(Paths.get("target"), "derbyddl")
    val url = s"jdbc:derby:$dbDir/ddldb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // first bootstrap: drop-phase errors (nothing to drop) tolerated
      val errs = Crawl.bootstrapReportingRole(
        conn, PgDdl.schemaBootstrap("crawl_t1", "derby"))
      assert(errs.isEmpty, s"bootstrap failed: $errs")
      // re-bootstrap over the existing schema also succeeds (per-crawl
      // drop/recreate, the reference's begin_scan contract)
      val errs2 = Crawl.bootstrapReportingRole(
        conn, PgDdl.schemaBootstrap("crawl_t1", "derby"))
      assert(errs2.isEmpty, s"re-bootstrap failed: $errs2")

      // insert a crawl row with byte-faithful path + 19-bit mode string
      val ins = conn.prepareStatement(
        "INSERT INTO crawl_t1.files(path, extension, st_mode, st_ino, st_dev," +
          " st_nlink, st_uid, st_gid, st_size, st_atime, st_mtime, st_ctime, owner)" +
          " VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)")
      val hostilePath = Array[Byte]('/', 'd', 0xff.toByte, '/', 'f')
      ins.setBytes(1, hostilePath)
      ins.setBytes(2, "dat".getBytes("UTF-8"))
      ins.setString(3, "1000000110100100100")
      ins.setLong(4, 42L); ins.setString(5, "2049"); ins.setInt(6, 1)
      ins.setLong(7, 1000L); ins.setLong(8, 1000L); ins.setLong(9, 5L)
      ins.setLong(10, 991353600L); ins.setLong(11, 991353600L); ins.setLong(12, 991353600L)
      ins.setString(13, "alice")
      ins.executeUpdate()
      ins.close()

      val rs = conn.createStatement()
        .executeQuery("SELECT path, st_mode, id FROM crawl_t1.files")
      assert(rs.next())
      assert(rs.getBytes(1).toSeq == hostilePath.toSeq, "path bytes mangled")
      assert(rs.getString(2) == "1000000110100100100")
      assert(rs.getInt(3) == 1) // identity assigned (SERIAL analog)
      assert(!rs.next())

      // status jsonb analog round-trips a snapshot blob
      val st = conn.prepareStatement("INSERT INTO crawl_t1.status(entry) VALUES (?)")
      st.setString(1, """{"files seen": {"value": 10, "units": "files"}, "time": 991353600}""")
      st.executeUpdate(); st.close()
      val rs2 = conn.createStatement().executeQuery("SELECT entry FROM crawl_t1.status")
      assert(rs2.next() && rs2.getString(1).contains("\"files seen\""))
    } finally conn.close()
  }
}
