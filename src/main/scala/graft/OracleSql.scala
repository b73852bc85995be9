package graft

/** Cost-hardening transform over the DuckDB oracle SQL surface.
  *
  * DuckDB 1.0 INLINES every non-`MATERIALIZED` CTE at each reference
  * site, so a CTE consumed from k FROM/JOIN positions re-evaluates k
  * times — and chained consumers multiply. Round 9's `q_kcore_prune`
  * chained four peel rounds over the shared minhash candidate CTE, the
  * band self-join re-expanded ~4⁴ ≈ 256×, the oracle stopped
  * terminating (>20 min vs 0.25 s materialized at sf0.01), and the
  * driver's whole round-correctness artifact zeroed to `{}`. The SQL
  * was CORRECT; its evaluation cost bricked the gate.
  *
  * Rather than trusting 230 hand-authored oracles to each remember the
  * hint, [[SparkEntry.oracleSql]] routes every oracle through
  * [[materializeShared]], which rewrites `name AS (` to
  * `name AS MATERIALIZED (` for exactly the CTEs that are:
  *   - referenced from ≥ 2 FROM/JOIN positions (single-consumer CTEs
  *     stay inlinable — inlining lets DuckDB push filters through),
  *   - not self-referential (a RECURSIVE member evaluates its fixpoint
  *     once regardless; the hint is meaningless there),
  *   - genuine CTE definitions (a `WINDOW w AS (...)` clause never
  *     rewrites: only the first definition site of a name is touched
  *     and window names never appear in FROM position, so they are
  *     never flagged).
  *
  * Materialization is purely an evaluation strategy — results and
  * types are unchanged — so the blanket rule is safe; OracleBudgetSpec
  * pins that the transformed surface has no unmaterialized shared CTE,
  * and tools/check.py's 10 s per-oracle budget is the runtime
  * backstop.
  */
object OracleSql {

  private val defRe =
    """(?i)\b([A-Za-z_]\w*)(\s+AS\s+)(MATERIALIZED\s+)?\(""".r

  /** FROM/JOIN reference targets, including comma-separated FROM lists
    * (`FROM hits, tri`) — the positions where DuckDB expands a CTE. */
  def fromTargets(sql: String): Seq[String] = {
    val fj =
      """(?i)\b(?:FROM|JOIN)\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)""".r
    fj.findAllMatchIn(sql).toSeq.flatMap { m =>
      m.group(1).split(",").map(_.trim.split("""\s+""").head.toLowerCase)
    }
  }

  /** Index just past the parenthesized body that opens at `open`
    * (single-quote-literal aware — parens inside '...' don't count). */
  private def closeOf(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    sql.length
  }

  private final case class CteDef(name: String, asEnd: Int, open: Int,
                                  materialized: Boolean, selfRef: Boolean)

  /** First definition site per CTE name (window-clause definitions of a
    * colliding name come later in the statement and are skipped). */
  private def cteDefs(sql: String): List[CteDef] = {
    val seen = scala.collection.mutable.Set.empty[String]
    defRe.findAllMatchIn(sql).toList.flatMap { m =>
      val name = m.group(1).toLowerCase
      // `x AS (`-shaped text that is not a CTE definition is preceded by
      // the WINDOW keyword; CTE defs are preceded by WITH/RECURSIVE/`,`
      val before = sql.substring(0, m.start).reverse.dropWhile(_.isWhitespace)
      val windowDecl = before.take(6).reverse.equalsIgnoreCase("WINDOW")
      if (windowDecl || !seen.add(name)) None
      else {
        val open = m.end - 1 // position of the '('
        val body = sql.substring(open, closeOf(sql, open))
        Some(CteDef(name, m.end(2), open,
          m.group(3) != null, fromTargets(body).contains(name)))
      }
    }
  }

  /** CTEs referenced ≥ 2 times that would re-evaluate per reference —
    * i.e. flagged and not yet MATERIALIZED. Empty on the shipped
    * surface (OracleBudgetSpec pins it). */
  def sharedUnmaterialized(sql: String): Seq[String] = {
    val defs = cteDefs(sql)
    val refs = fromTargets(sql).groupBy(identity).view.mapValues(_.size).toMap
    defs.collect {
      case d if !d.materialized && !d.selfRef && refs.getOrElse(d.name, 0) >= 2 =>
        d.name
    }
  }

  /** Rewrites every shared, non-recursive CTE to `AS MATERIALIZED (`. */
  def materializeShared(sql: String): String = {
    val defs = cteDefs(sql)
    val refs = fromTargets(sql).groupBy(identity).view.mapValues(_.size).toMap
    val sites = defs.filter(d =>
      !d.materialized && !d.selfRef && refs.getOrElse(d.name, 0) >= 2)
    // splice right-to-left so earlier offsets stay valid
    sites.sortBy(-_.asEnd).foldLeft(sql) { (acc, d) =>
      acc.substring(0, d.asEnd) + "MATERIALIZED " + acc.substring(d.asEnd)
    }
  }
}
