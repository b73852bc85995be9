package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural cost gate over every DuckDB oracle in
  * [[SparkEntry.oracleSql]], plus unit pins for the
  * [[OracleSql.materializeShared]] rewrite it rides on.
  *
  * DuckDB 1.0 INLINES non-materialized CTEs at every reference site, so
  * a CTE consumed k times re-evaluates k times — and chained consumers
  * multiply (r9: `q_kcore_prune`'s four peel rounds re-expanded the
  * minhash band self-join ~4⁴ ≈ 256×, the oracle stopped terminating,
  * and the driver's whole CORRECTNESS_r09.json zeroed to `{}`). The SQL
  * was correct; its COST bricked the gate. tools/check.py's 10 s
  * per-oracle budget is the runtime backstop; this spec is the
  * authoring-side gate.
  */
class OracleBudgetSpec extends AnyFunSuite {

  test("no oracle ships a shared CTE that DuckDB would re-inline") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        OracleSql.sharedUnmaterialized(sql).map(cte => s"$name: CTE '$cte'")
    }
    assert(bad.isEmpty,
      s"\nnon-materialized multiply-referenced CTEs (r9 gate-breaker " +
        s"class):\n  ${bad.mkString("\n  ")}")
  }

  test("materializeShared rewrites shared CTEs and only those") {
    val sql =
      """WITH a AS (SELECT 1 AS x),
        |b AS (SELECT x FROM a),
        |c AS (SELECT * FROM b JOIN b b2 USING (x))
        |SELECT * FROM c, a""".stripMargin
    val out = OracleSql.materializeShared(sql)
    // a (2 refs) and b (2 refs) rewrite; c (1 ref) stays inlinable
    assert(out.contains("a AS MATERIALIZED (SELECT 1"))
    assert(out.contains("b AS MATERIALIZED (SELECT x"))
    assert(out.contains("c AS (SELECT * FROM b JOIN"))
  }

  test("materializeShared is idempotent and leaves recursive members alone") {
    val rec =
      """WITH RECURSIVE r AS (
        |  SELECT 1 AS x UNION ALL SELECT x + 1 FROM r WHERE x < 3)
        |SELECT count(*) FROM r JOIN r r2 USING (x)""".stripMargin
    // r is self-referential: the fixpoint evaluates once regardless, so
    // no hint is inserted even though r has 3 FROM references
    assert(OracleSql.materializeShared(rec) === rec)
    val shared = "WITH t AS (SELECT 1 AS x) SELECT * FROM t, t t2"
    val once = OracleSql.materializeShared(shared)
    assert(once.contains("AS MATERIALIZED ("))
    assert(OracleSql.materializeShared(once) === once)
  }

  test("window-clause definitions never rewrite; quoted parens don't confuse spans") {
    val win =
      """WITH w AS (SELECT 1 AS x)
        |SELECT sum(x) OVER w FROM w, w w2
        |WINDOW w AS (ORDER BY x)""".stripMargin
    val out = OracleSql.materializeShared(win)
    assert(out.contains("WITH w AS MATERIALIZED (SELECT 1"))
    assert(out.contains("WINDOW w AS (ORDER BY x)"))
    val quoted =
      "WITH t AS (SELECT '((' AS x) SELECT * FROM t JOIN t t2 USING (x)"
    val q = OracleSql.materializeShared(quoted)
    assert(q.contains("t AS MATERIALIZED (SELECT '((' AS x)"))
  }

  test("every transformed oracle still parses in the engine's dialect shape") {
    // cheap structural sanity: balanced parens outside string literals
    // (a splice bug would unbalance them long before DuckDB sees it)
    for ((name, sql) <- SparkEntry.oracleSql) {
      var depth = 0
      var inStr = false
      sql.foreach { c =>
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        assert(depth >= 0, s"$name: unbalanced ')'")
      }
      assert(depth === 0, s"$name: unbalanced '('")
      assert(!inStr, s"$name: unterminated string literal")
    }
  }
}
