package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.ConfigLayers

/** configargparse-parity layering (storcrawl.py:16-53): CLI > env >
  * config files, later default files override earlier, explicit
  * --config-file replaces the default chain, [+] keys accumulate
  * within a file but a winning layer replaces lower ones. */
class ConfigLayersSpec extends AnyFunSuite {

  private def rc(lines: String*): String = {
    val f = Files.createTempFile("storcrawlrc", "")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("rc syntax: =, :, bare flags, comments, quotes, repeats") {
    val m = ConfigLayers.parseRc(Seq(
      "# comment", "; also comment", "",
      "tag = nightly",
      "logdir: /var/log",
      "debug",
      "owners = '/etc/owners.txt'",
      "dir = /data1",
      "dir = /data2"))
    assert(m("tag") == List("nightly"))
    assert(m("logdir") == List("/var/log"))
    assert(m("debug") == List("true"))
    assert(m("owners") == List("/etc/owners.txt"))
    assert(m("dir") == List("/data1", "/data2"))
  }

  test("precedence: cli > env > later rc > earlier rc > default") {
    val early = rc("tag = from-early", "update = 30")
    val late = rc("tag = from-late")
    val paths = Seq(early, late)
    // rc only: later file wins for tag; earlier still supplies update
    assert(ConfigLayers.resolveOne("tag", Map.empty, "dflt",
      env = Map.empty, rcPaths = paths) == "from-late")
    assert(ConfigLayers.resolveOne("update", Map.empty, "60",
      env = Map.empty, rcPaths = paths) == "30")
    // env beats rc
    assert(ConfigLayers.resolveOne("tag", Map.empty, "dflt",
      env = Map("STORCRAWL_TAG" -> "from-env"), rcPaths = paths) == "from-env")
    // cli beats env
    assert(ConfigLayers.resolveOne("tag", Map("tag" -> List("from-cli")), "dflt",
      env = Map("STORCRAWL_TAG" -> "from-env"), rcPaths = paths) == "from-cli")
    // nothing anywhere → default
    assert(ConfigLayers.resolveOne("walkers", Map.empty, "4",
      env = Map.empty, rcPaths = paths) == "4")
  }

  test("explicit config file replaces the default chain") {
    val dflt = rc("tag = default-chain")
    val explicit = rc("tag = explicit-file")
    assert(ConfigLayers.resolveOne("tag",
      Map("config-file" -> List(explicit)), "d",
      env = Map.empty, rcPaths = Seq(dflt)) == "explicit-file")
    // env var form of the config-file pointer works too
    assert(ConfigLayers.resolveOne("tag", Map.empty, "d",
      env = Map("STORCRAWL_CONFIG_FILE" -> explicit),
      rcPaths = Seq(dflt)) == "explicit-file")
    // a key absent from the explicit file does NOT fall through to the
    // default chain (is_config_file semantics)
    assert(ConfigLayers.resolveOne("logdir",
      Map("config-file" -> List(explicit)), "./",
      env = Map.empty, rcPaths = Seq(rc("logdir = /from-chain"))) == "./")
  }

  test("append keys: winning layer replaces lower layers") {
    val file = rc("dir = /rc1", "dir = /rc2")
    // rc supplies both
    assert(ConfigLayers.resolve("dir", Map.empty,
      env = Map.empty, rcPaths = Seq(file)) == List("/rc1", "/rc2"))
    // cli replaces rc entirely (configargparse behavior)
    assert(ConfigLayers.resolve("dir", Map("dir" -> List("/cli")),
      env = Map.empty, rcPaths = Seq(file)) == List("/cli"))
    // env is single-valued ("except as ENV VARs")
    assert(ConfigLayers.resolve("dir", Map.empty,
      env = Map("STORCRAWL_DIR" -> "/env"), rcPaths = Seq(file)) == List("/env"))
  }

  test("parseArgs: values, repeats, flags, positional") {
    val (cli, pos) = ConfigLayers.parseArgs(
      Seq("file_report", "--tag", "t1", "--exclude", "a", "--exclude", "b", "--json"),
      flags = Set("json"))
    assert(pos == Seq("file_report"))
    assert(cli("tag") == List("t1"))
    assert(cli("exclude") == List("a", "b"))
    assert(cli("json") == List("true"))
  }

  test("missing rc files are silently skipped") {
    assert(ConfigLayers.resolveOne("tag", Map.empty, "d",
      env = Map.empty, rcPaths = Seq("/nonexistent/rc")) == "d")
  }

  test("an explicitly named config file that is unreadable fails fast") {
    // configargparse errors on a missing explicit config file; a typo'd
    // path must not silently resolve as if no rc existed
    val exCli = intercept[IllegalArgumentException] {
      ConfigLayers.resolve("tag",
        Map("config-file" -> List("/nonexistent/typo.rc")), env = Map.empty)
    }
    assert(exCli.getMessage.contains("/nonexistent/typo.rc"))
    val exEnv = intercept[IllegalArgumentException] {
      ConfigLayers.resolve("tag", Map.empty,
        env = Map("STORCRAWL_CONFIG_FILE" -> "/nonexistent/typo.rc"))
    }
    assert(exEnv.getMessage.contains("not readable"))
  }
}
