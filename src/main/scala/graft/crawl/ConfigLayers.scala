package graft.crawl

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Layered configuration resolution mirroring the reference's
  * configargparse setup (storcrawl.py:16-53, report.py:14-36):
  *
  *  - default config files `/etc/storcrawlrc`, `~/storcrawlrc`,
  *    `~/.storcrawlrc` (later files override earlier, per key);
  *  - an explicit config file via `--config-file` /
  *    `STORCRAWL_CONFIG_FILE` overrides the defaults entirely
  *    (configargparse `is_config_file` semantics);
  *  - environment variables `STORCRAWL_<KEY>` override config files;
  *  - command-line flags override everything.
  *
  * Config file syntax is configargparse's: `key = value`, `key: value`,
  * or bare `flag` for booleans; `#` comments. A key repeated within one
  * file accumulates (the reference's [+] append arguments: dir,
  * exclude); across layers the winning layer replaces lower ones, as
  * configargparse does. Unknown keys are ignored with a warning rather
  * than rejected — an rc file shared with the reference installation
  * may carry DB keys (dbhost, dbuser, ...) this engine does not use.
  */
object ConfigLayers {

  val DefaultRcPaths: Seq[String] = Seq(
    "/etc/storcrawlrc",
    sys.props.get("user.home").map(_ + "/storcrawlrc").getOrElse("~/storcrawlrc"),
    sys.props.get("user.home").map(_ + "/.storcrawlrc").getOrElse("~/.storcrawlrc"))

  /** One parsed rc file: key → values in file order. */
  private[graft] def parseRc(lines: Seq[String]): Map[String, List[String]] = {
    val kv = "^([A-Za-z][A-Za-z0-9_-]*)\\s*[=:]\\s*(.*)$".r
    val bare = "^([A-Za-z][A-Za-z0-9_-]*)\\s*$".r
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";"))
      .flatMap {
        case kv(k, v) => Some(k.toLowerCase -> stripQuotes(v.trim))
        case bare(k)  => Some(k.toLowerCase -> "true")
        case other =>
          System.err.println(s"[config] ignoring malformed rc line: $other")
          None
      }
      .toList
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 &&
        ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  private def readRc(p: Path): Map[String, List[String]] =
    if (Files.isReadable(p))
      try parseRc(Files.readAllLines(p).asScala.toSeq)
      catch { case _: Exception => Map.empty }
    else Map.empty

  /** Resolve one key across the layers. `cli` holds values per long
    * option name as parsed from argv; `env` is the process environment
    * (key looked up as STORCRAWL_<KEY> with '-' → '_', upper-cased).
    * Env values for the reference's [+] keys are single values, as the
    * reference notes ("except as ENV VARs"). */
  def resolve(
      key: String,
      cli: Map[String, List[String]],
      env: Map[String, String] = sys.env,
      rcPaths: Seq[String] = DefaultRcPaths): List[String] = {
    // explicit config file (CLI/env) replaces the default chain; unlike
    // the silent default chain, a NAMED file that cannot be read is an
    // error (configargparse parity: it validates the file at parse time
    // regardless of which layer ultimately satisfies each key, so the
    // check runs BEFORE any short-circuit on cli/env hits — a typo'd
    // --config-file must never silently resolve as if absent)
    val explicit = cli.get("config-file").flatMap(_.headOption)
      .orElse(env.get("STORCRAWL_CONFIG_FILE"))
    explicit.foreach { p =>
      require(Files.isReadable(Paths.get(p)), s"config file not readable: $p")
    }
    cli.get(key) match {
      case Some(vs) if vs.nonEmpty => vs
      case _ =>
        val envKey = "STORCRAWL_" + key.toUpperCase.replace('-', '_')
        env.get(envKey) match {
          case Some(v) => List(v)
          case None =>
            val chain = explicit.map(Seq(_)).getOrElse(rcPaths)
            // later files override earlier, per key
            chain.reverseIterator
              .map(p => readRc(Paths.get(p)))
              .collectFirst { case m if m.contains(key) => m(key) }
              .getOrElse(Nil)
        }
    }
  }

  /** Convenience single-value accessor with default. */
  def resolveOne(
      key: String,
      cli: Map[String, List[String]],
      default: => String,
      env: Map[String, String] = sys.env,
      rcPaths: Seq[String] = DefaultRcPaths): String =
    resolve(key, cli, env, rcPaths).lastOption.getOrElse(default)

  /** Parse argv of the form `--key value` / `--flag` (+ repeats) into
    * the cli layer; `flags` names the zero-argument switches. */
  def parseArgs(
      args: Seq[String],
      flags: Set[String]): (Map[String, List[String]], Seq[String]) = {
    var cli = Map.empty[String, List[String]]
    val positional = Seq.newBuilder[String]
    var i = 0
    def add(k: String, v: String): Unit =
      cli = cli.updated(k, cli.getOrElse(k, Nil) :+ v)
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val k = a.drop(2).toLowerCase
        if (flags.contains(k)) { add(k, "true"); i += 1 }
        else {
          require(i + 1 < args.length, s"missing value for --$k")
          add(k, args(i + 1)); i += 2
        }
      } else { positional += a; i += 1 }
    }
    (cli, positional.result())
  }

  private[crawl] def isTrue(v: String): Boolean =
    v == "true" || v == "1" || v == "yes" || v == "on"
}
