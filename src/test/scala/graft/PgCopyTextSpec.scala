package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.PgCopyText

/** COPY text-format encoding ([[PgCopyText]]) pinned without a live
  * server (PgLiveSpec proves the same bytes round-trip through a real
  * PostgreSQL 15; this keeps the contract tested when the spec's
  * cluster is unavailable). */
class PgCopyTextSpec extends AnyFunSuite {

  test("escape doubles backslash and encodes tab/newline/CR") {
    assert(PgCopyText.escape("a\tb") == "a\\tb")
    assert(PgCopyText.escape("a\nb\rc") == "a\\nb\\rc")
    assert(PgCopyText.escape("a\\b") == "a\\\\b")
    assert(PgCopyText.escape("plain 'quoted' \"too\"") == "plain 'quoted' \"too\"")
    // escaping composes: a literal backslash-t stays distinguishable
    // from a tab after server-side unescaping
    assert(PgCopyText.escape("\\t") == "\\\\t")
  }

  test("bytea emits the COPY-escaped hex input form") {
    // server unescapes "\\x00ff5c" -> "\x00ff5c" -> bytea 00 ff 5c
    assert(PgCopyText.bytea(Array(0x00, 0xff, 0x5c).map(_.toByte)) == "\\\\x00ff5c")
    assert(PgCopyText.bytea(Array.emptyByteArray) == "\\\\x")
  }

  test("line joins fields with tabs; Null is the COPY null sentinel") {
    assert(PgCopyText.line(Seq("a", PgCopyText.Null, "3")) == "a\t\\N\t3")
  }
}
