package graft.crawl

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcType}
import org.apache.spark.sql.types._

/** Per-crawl schema DDL with the reference's exact Postgres types
  * (storcrawl.py:96-165): `bytea` paths (filenames are bytes, not
  * text), `bit(19)` st_mode, `timestamp with time zone` insert_time,
  * `jsonb` status entries — emitted as the reference's statement
  * sequence (drop schema cascade → create schema → search_path → drop
  * tables → create files/status).
  *
  * Fidelity is asserted three ways: the `postgres` dialect's generated
  * DDL text is spec-pinned verbatim; the `derby` dialect maps the same
  * logical schema onto embedded Derby types and is executed +
  * round-tripped against a real database in JdbcSinkSpec; and the
  * postgres dialect is EXECUTED against a live throwaway PostgreSQL 15
  * cluster in PgLiveSpec (catalog types, hostile bytea/bit(19) rows,
  * live role authorization — everything the reference itself runs
  * through DDL/DML). The one leg still untestable in this sandbox is
  * Spark's own `df.write.jdbc` against postgres: no postgresql JDBC
  * driver jar is available offline, so [[PgCrawlDialect]]'s type
  * mapping is exercised only through the dialect unit tests.
  */
object PgDdl {

  /** Quote an SQL identifier only when it is not a safe bareword —
    * keeps the reference's unquoted text for normal names while making
    * hostile ones (mixed case, hyphens, quotes) syntactically inert. */
  def quoteIdent(name: String): String =
    if (name.matches("[a-z_][a-z0-9_]*")) name
    else "\"" + name.replace("\"", "\"\"") + "\""

  /** Escape a string literal for single-quoted SQL embedding. */
  def quoteLiteral(value: String): String = value.replace("'", "''")

  /** The reference's files DDL (storcrawl.py:132-148), types verbatim
    * for postgres, mapped for derby (no bytea/bit/serial there).
    * Derby's NULLABLE binary/string columns are BLOB/CLOB — Spark's
    * JDBC writer signals nulls with those JDBC types and Derby rejects
    * the setNull conversion into `.. FOR BIT DATA`/VARCHAR; NOT NULL
    * columns keep the tighter types. */
  def filesTableDdl(schema: String, dialect: String = "postgres"): String = {
    val q = quoteIdent(schema)
    dialect match {
      case "postgres" =>
        s"""CREATE TABLE $q.files(
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
           |  owner text)""".stripMargin
      case "derby" =>
        s"""CREATE TABLE $q.files(
           |  id INTEGER GENERATED ALWAYS AS IDENTITY,
           |  insert_time TIMESTAMP DEFAULT CURRENT_TIMESTAMP NOT NULL,
           |  path LONG VARCHAR FOR BIT DATA NOT NULL,
           |  extension BLOB,
           |  st_mode CHAR(19) NOT NULL,
           |  st_ino BIGINT NOT NULL,
           |  st_dev VARCHAR(64) NOT NULL,
           |  st_nlink INT NOT NULL,
           |  st_uid BIGINT NOT NULL,
           |  st_gid BIGINT NOT NULL,
           |  st_size BIGINT NOT NULL,
           |  st_atime BIGINT NOT NULL,
           |  st_mtime BIGINT NOT NULL,
           |  st_ctime BIGINT NOT NULL,
           |  owner CLOB)""".stripMargin
      case other => sys.error(s"unknown dialect: $other (postgres|derby)")
    }
  }

  /** The reference's status DDL (storcrawl.py:157-160): one jsonb blob
    * per snapshot. */
  def statusTableDdl(schema: String, dialect: String = "postgres"): String = {
    val q = quoteIdent(schema)
    dialect match {
      case "postgres" => s"CREATE TABLE $q.status(\n  entry jsonb NOT NULL)"
      case "derby"    => s"CREATE TABLE $q.status(\n  entry LONG VARCHAR NOT NULL)"
      case other      => sys.error(s"unknown dialect: $other (postgres|derby)")
    }
  }

  /** The per-crawl bootstrap sequence (storcrawl.py:96-165). Element =
    * (statement, tolerated): drop-phase statements log-and-continue in
    * the reference; create failures are fatal — the same contract
    * [[Crawl.bootstrapReportingRole]] executes. Derby has no
    * `IF EXISTS`/`CASCADE`/`search_path`; its plain drops rely on the
    * tolerated flag and `SET SCHEMA` replaces `search_path`. */
  def schemaBootstrap(schema: String, dialect: String = "postgres"): Seq[(String, Boolean)] = {
    val q = quoteIdent(schema)
    dialect match {
      case "postgres" => Seq(
        (s"DROP SCHEMA IF EXISTS $q CASCADE", true),
        (s"CREATE SCHEMA $q", false),
        (s"SET search_path TO $q", false),
        (s"DROP TABLE IF EXISTS $q.files", true),
        (s"DROP TABLE IF EXISTS $q.status", true),
        (filesTableDdl(schema, dialect), false),
        (statusTableDdl(schema, dialect), false))
      case "derby" => Seq(
        (s"DROP TABLE $q.files", true),
        (s"DROP TABLE $q.status", true),
        (s"DROP SCHEMA $q RESTRICT", true),
        (s"CREATE SCHEMA $q", false),
        (s"SET SCHEMA $q", false),
        (filesTableDdl(schema, dialect), false),
        (statusTableDdl(schema, dialect), false))
      case other => sys.error(s"unknown dialect: $other (postgres|derby)")
    }
  }

  /** Spark JDBC dialect for the crawl sink: when Spark itself creates
    * or maps the table (`df.write.jdbc` without pre-created DDL), send
    * BinaryType paths as `BYTEA` and timestamps as `timestamptz`,
    * matching the reference's column types instead of Spark's generic
    * defaults. Register once per JVM via [[registerPgCrawlDialect]]. */
  object PgCrawlDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:postgresql")
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case BinaryType => Some(JdbcType("BYTEA", java.sql.Types.BINARY))
      case TimestampType =>
        Some(JdbcType("TIMESTAMP WITH TIME ZONE", java.sql.Types.TIMESTAMP))
      case _ => None
    }
  }

  def registerPgCrawlDialect(): Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(PgCrawlDialect)
}
