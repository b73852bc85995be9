package graft

import java.nio.file.{Files, Paths}
import java.sql.DriverManager

import graft.crawl.Crawl

/** S5 remainder — the reporting-role bootstrap (storcrawl.py:166-215)
  * executed against embedded Derby with SQL authorization ON: the
  * read-only role exists, a granted reporter can SELECT the crawl
  * table, an ungranted user cannot, and the drop+recreate sequence is
  * re-runnable. */
class ReportingRoleSpec extends SparkSpec {

  test("postgres dialect emits the reference's statement sequence") {
    val stmts = Crawl.reportingRoleStatements(
      "postgres", "storcrawl_tag1", "crawldb", "storcrawl_ro", "yummymetadata")
    assert(stmts.map(_._1) == Seq(
      "DROP OWNED BY storcrawl_ro",
      "DROP USER IF EXISTS storcrawl_ro",
      "CREATE USER storcrawl_ro WITH ENCRYPTED PASSWORD 'yummymetadata'",
      """GRANT CONNECT ON DATABASE "crawldb" TO storcrawl_ro""",
      "GRANT USAGE ON SCHEMA storcrawl_tag1 TO storcrawl_ro",
      "GRANT SELECT ON ALL SEQUENCES IN SCHEMA storcrawl_tag1 TO storcrawl_ro",
      "GRANT SELECT ON ALL TABLES IN SCHEMA storcrawl_tag1 TO storcrawl_ro"))
    assert(stmts.takeWhile(_._2).size == 2) // exactly the two drops tolerated
  }

  test("standard dialect bootstraps a working read-only role on Derby") {
    val dbDir = Files.createTempDirectory(Paths.get("target"), "derby-roles")
    val db = s"$dbDir/roledb"
    // create the db as DBA "app", turn on SQL authorization, reboot
    val c0 = DriverManager.getConnection(s"jdbc:derby:$db;create=true", "app", "app")
    val st0 = c0.createStatement()
    st0.execute("CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
      "'derby.database.sqlAuthorization', 'true')")
    st0.close(); c0.close()
    try DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true")
    catch { case _: java.sql.SQLException => () } // XJ015: expected on shutdown

    val dba = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    val st = dba.createStatement()
    st.execute("CREATE TABLE files(path VARCHAR(512), st_size BIGINT)")
    st.execute("INSERT INTO files VALUES ('/a', 1), ('/b', 2)")
    st.close()

    val stmts = Crawl.reportingRoleStatements(
      "standard", schema = "app", dbName = "roledb",
      user = "storcrawl_ro", pass = "unused",
      tables = Seq("files"), grantees = Seq("reporter"))
    // first run: DROP ROLE fails (tolerated), everything else applies
    assert(Crawl.bootstrapReportingRole(dba, stmts).isEmpty)
    // re-run: drop+recreate is clean (the reference's rerun behavior)
    assert(Crawl.bootstrapReportingRole(dba, stmts).isEmpty)

    val roles = {
      val rs = dba.createStatement()
        .executeQuery("SELECT roleid FROM SYS.SYSROLES WHERE isdef = 'Y'")
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result()
    }
    assert(roles.contains("STORCRAWL_RO"))

    // the granted reporter can read through the role
    val rep = DriverManager.getConnection(s"jdbc:derby:$db", "reporter", "x")
    val rst = rep.createStatement()
    rst.execute("SET ROLE storcrawl_ro")
    val rs = rst.executeQuery("SELECT COUNT(*) FROM app.files")
    rs.next()
    assert(rs.getLong(1) == 2L)
    rep.close()

    // an ungranted user cannot
    val rando = DriverManager.getConnection(s"jdbc:derby:$db", "rando", "x")
    val ex = intercept[java.sql.SQLException] {
      rando.createStatement().executeQuery("SELECT COUNT(*) FROM app.files")
    }
    assert(ex.getSQLState.startsWith("4250")) // permission denied (42500/42502)
    rando.close()
    dba.close()
  }
}
