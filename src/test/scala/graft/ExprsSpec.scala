package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.Exprs

/** F2/F3/J1 scalar semantics, including the Appendix-A1 quirks. */
class ExprsSpec extends SparkSpec {

  // --- faithful Scala port vs the Python loop's documented behavior

  test("find_extension: documented cases (storcrawl.py:259-268)") {
    val f = Exprs.findExtensionScala
    // FIRST dot in the window wins — 'a.tar.gz' windows '.tar.g', so the
    // whole 'tar.gz' comes back (not just 'gz'): the reference scans
    // low-to-high within the tail
    assert(f("a.tar.gz") == "tar.gz")
    assert(f("archive.backup") == "backup") // dot sits at the window edge
    assert(f("noext") == null)             // no dot at all
    assert(f("x.") == "")                  // trailing dot via wrap phase
    assert(f("a.b") == "b")
    assert(f(".hidden") == "hidden")
    // window EXCLUDES the final char: only dot is final → wrap finds the
    // earlier dot first
    assert(f("x.abcdefg.") == "abcdefg.")
    // dot exactly at len-2 (inside window)
    assert(f("abcdef.z") == "z")
  }

  test("find_extension: Column expression ≡ Scala port (generated)") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('.'), Gen.const('/')))
      .map(_.mkString)
    val samples = (1 to 300).flatMap(_ => gen.sample).distinct.filter(_.nonEmpty)
    val df = samples.toDF("p")
    val got = df.select(col("p"), Exprs.findExtensionCol(col("p")).as("e"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    samples.foreach { s =>
      assert(got(s) == Option(Exprs.findExtensionScala(s)),
        s"mismatch for '$s': col=${got(s)} scala=${Option(Exprs.findExtensionScala(s))}")
    }
  }

  test("mode bits: 19-char zero-padded binary (storcrawl.py:361)") {
    import spark.implicits._
    val r = Seq(19, 0, 262143).toDF("m")
      .select(Exprs.modeBits(col("m")).as("b")).collect().map(_.getString(0))
    assert(r(0) == "0000000000000010011")
    assert(r(1) == "0000000000000000000")
    assert(r(2) == "0111111111111111111") // 262143 = 2^18-1 → 18 ones
    assert(r.forall(_.length == 19))
  }

  test("ancestorPrefixes: root, ancestors, and self, ordered by depth") {
    import spark.implicits._
    val r = Seq("/a/b/c").toDF("p")
      .select(explode(Exprs.ancestorPrefixes(col("p"))).as("x"))
      .select("x.prefix", "x.depth")
      .collect().map(x => (x.getString(0), x.getInt(1)))
    assert(r.toSeq == Seq(("/", 0), ("/a", 2), ("/a/b", 3), ("/a/b/c", 4)))
    // relative paths yield their own prefixes and stop at the first
    // segment (A7 divergence guard)
    val rel = Seq("a/b").toDF("p")
      .select(explode(Exprs.ancestorPrefixes(col("p"))).as("x"))
      .select("x.prefix").collect().map(_.getString(0))
    assert(rel.toSeq == Seq("a", "a/b"))
  }

  test("md5Long is stable and positive (shared hash family)") {
    import spark.implicits._
    val r = Seq("abc").toDF("s").select(Exprs.md5Long(col("s"))).head().getLong(0)
    assert(r == 648541476951500027L) // == DuckDB CAST('0x'||substr(md5('abc'),1,15) AS BIGINT)
    assert(r > 0)
  }
}
