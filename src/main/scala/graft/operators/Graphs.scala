package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.functions.Exprs.nanosToSec

/** Graph analytics over the event-derived transition graph.
  *
  * The transition matrix ([[Sequences.qEventTransitions]]) IS a
  * weighted directed graph: nodes are event types, edge weights are
  * consecutive-pair counts. The canonical whole-graph computation over
  * such a structure is the power-iteration step — PageRank's inner
  * loop — and its Spark shape (edges join ranks on src, contributions
  * aggregate on dst) is exactly the join+agg pattern that scales to
  * billions of edges: no adjacency matrix, no driver-side graph
  * object, each iteration one co-partitioned join and one dst-keyed
  * aggregate. GraphX does the same thing with more machinery; on a
  * DataFrame engine the plain join is the idiomatic form (and what
  * GraphFrames compiles to).
  */
object Graphs {

  type Q = (SparkSession, String) => DataFrame

  /** q_pagerank_step — one exact power-iteration step of weighted
    * PageRank (d = 0.85) over the event-type transition graph, from
    * the uniform start vector, in integer micro-units: per node the
    * out-weight, the uniform pr₀, and
    * pr₁(v) = (1−d)/N + d·Σᵤ pr₀(u)·w(u→v)/out(u), every term floored
    * to micros before summation so the result is engine-independent.
    * Dangling mass (nodes with no out-edges) is dropped, the classic
    * simplification — the fixtures' transition graph has none.
    *
    * Scale shape: the edge list builds from one user-keyed lag window
    * (the [[Sequences.qEventTransitions]] spine) and aggregates to
    * |V|² cells at most; the rank step is edges ⋈ out-weights on src
    * (same key, one exchange) then a dst-keyed SUM — at a billion
    * edges this is two shuffles, nothing driver-side, which is why
    * PageRank-on-DataFrames is the textbook scale pattern here. */
  val qPagerankStep: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
    val edges = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        nanosToSec(col("ts")).as("ts_sec"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("weight"))
    val nodes = Tables.events(s, d).select(col("event_type").as("node")).distinct()
    val nN = nodes.agg(count(lit(1)).as("n_nodes"))
    val out = edges.groupBy(col("src")).agg(sum("weight").as("out_weight"))
    // pr0 in micros is uniform; contribution floor per edge keeps the
    // sum exact across engines
    val contribs = edges.join(out, "src")
      .crossJoin(broadcast(nN))
      .select(col("dst"),
        expr("(((1000000 div n_nodes) * 85 * weight) div (out_weight * 100))")
          .cast(LongType).as("c"))
      .groupBy("dst").agg(sum("c").cast(LongType).as("in_flow"))
    nodes.crossJoin(broadcast(nN))
      .join(out.withColumnRenamed("src", "node"), Seq("node"), "left")
      .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_weight"), lit(0L)).cast(LongType).as("out_weight"),
        expr("1000000 div n_nodes").cast(LongType).as("pr0_micro"),
        (expr("(15 * 1000000) div (100 * n_nodes)")
          + coalesce(col("in_flow"), lit(0L))).cast(LongType).as("pr1_micro"))
      .orderBy("node")
  }

  /** q_dup_triangles — triangle census + global clustering coefficient
    * of the minhash-LSH candidate graph: n_edges, n_nodes,
    * n_triangles, n_wedges (Σ C(deg,2) open two-paths) and
    * closure = 3·triangles/wedges in permille. The cohesion diagnostic
    * of a dedup candidate graph: closure near 1000 means candidates
    * form tight cliques (true duplicate clusters — transitive pruning
    * is safe); low closure means chains of borderline pairs where a
    * single-pass "drop b" policy over-merges. Same edge spine as
    * [[Dedup.qDedupComponents]], read for shape instead of membership.
    *
    * Scale shape: the textbook distributed triangle count — edges kept
    * in a<b orientation (each triangle counted exactly once as
    * a<b<c), wedge join e1(a,b)⋈e2(b,c) on the shared middle vertex,
    * closure check e3(a,c) as a second equi-join. All three legs are
    * the SAME candidate-graph-sized table (checkpointed once);
    * nothing is corpus-sized and no adjacency structure ever
    * materializes driver-side. Degree sums ride one |V|-group
    * aggregate. */
  val qDupTriangles: Q = (s, d) => {
    val edges = Dedup.minhashCandidatePairs(s, d)
      .select(col("a"), col("b"))
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).cast(LongType).as("n_wedges"),
      count(lit(1)).as("n_nodes"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(wedges))
      .crossJoin(broadcast(tri))
      .select(col("n_edges"), col("n_nodes"), col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") > 0,
          expr("(3 * n_triangles * 1000) div n_wedges"))
          .otherwise(0L).cast(LongType).as("closure_permille"))
  }

  /** q_kcore_prune — bounded-round 2-core peel of the minhash-LSH
    * candidate graph: 4 supersteps of "recompute degrees, drop nodes
    * with degree < 2, keep edges whose endpoints both survive",
    * emitting the surviving nodes with their final degree. The 2-core
    * strips pendant pairs and chains, leaving only cyclically-cohesive
    * duplicate clusters — the structures worth human review in a dedup
    * audit (an isolated near-dup PAIR is routine; a dense CORE is a
    * template farm or a mirror). Fixed supersteps, not
    * loop-until-converged, is the distributed-graph contract (Pregel's
    * bounded iteration): both engines run the same four rounds, and
    * the spec proves round 4 is already a fixpoint on the fixtures.
    *
    * Plan: each round is one degree aggregate + two semi-join-shaped
    * equi-joins on the edge endpoints, localCheckpointed so plans stay
    * flat (and each round's shuffle is candidate-graph-sized, which
    * LSH banding already bounded — never corpus²). */
  val qKcorePrune: Q = (s, d) => {
    val edges0 = Dedup.minhashCandidatePairs(s, d)
      .select(col("a"), col("b"))
    def peel(e: DataFrame): DataFrame = {
      val keep = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2).select("v")
      e.join(keep.withColumnRenamed("v", "a"), Seq("a"))
        .join(keep.withColumnRenamed("v", "b"), Seq("b"))
        .select("a", "b")
    }
    val core = (1 to 4).foldLeft(edges0)((e, _) => peel(e).localCheckpoint())
    core.select(col("a").as("doc_id")).unionAll(core.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
      .select(col("doc_id").cast(LongType).as("doc_id"),
        col("deg").cast(LongType).as("deg"))
      .orderBy("doc_id")
  }

  /** q_degree_histogram — the candidate graph's degree distribution
    * in log₂ bands: nodes per band, edges-endpoints per band, and the
    * band's share of total degree mass in permille. THE first plot of
    * any graph audit — a power-law tail here says the dup graph has
    * template-farm hubs (and that per-node algorithms need skew
    * handling); a flat head says pairwise near-dups only. Plan: the
    * candidate generator is banded-LSH (never all-pairs), degrees are
    * one endpoint-union aggregate, the histogram is a ≤64-group
    * rollup — each stage strictly smaller than the last. */
  val qDegreeHistogram: Q = (s, d) => {
    val e = Dedup.minhashCandidatePairs(s, d)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    deg
      .withColumn("band", length(bin(col("deg"))).cast(LongType))
      .groupBy("band")
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("deg")).cast(LongType).as("degree_mass"))
      .withColumn("mass_permille",
        expr("(degree_mass * 1000) div (sum(degree_mass) OVER ())")
          .cast(LongType))
      .orderBy("band")
  }

  /** q_label_propagation — one synchronous label-propagation step
    * over the candidate graph, seeded by each document's lang: every
    * node adopts its neighborhood's majority lang (count desc, lang
    * asc — deterministic ties), emitting old vs new label and whether
    * it flipped. The community-detection primitive (Raghavan et al.
    * 2007) in its one-superstep Spark shape: edges ⋈ broadcast-or-
    * shuffled labels on BOTH endpoints (two equi-joins, the Pregel
    * message pattern), one (node, lang) count aggregate, one argmax
    * struct-max — no windows over the corpus, candidate-graph-sized
    * throughout. Flips on a lang-seeded dup graph flag documents
    * whose near-duplicates disagree about their language — lang-ID
    * errors surfaced by graph structure. */
  val qLabelPropagation: Q = (s, d) => {
    val labels = Tables.documents(s, d)
      .select(col("doc_id").as("v"), col("lang"))
    val e = Dedup.minhashCandidatePairs(s, d)
    val msgs = e.select(col("a").as("v"), col("b").as("nbr"))
      .unionAll(e.select(col("b").as("v"), col("a").as("nbr")))
      .join(labels.select(col("v").as("nbr"), col("lang")), Seq("nbr"))
    // deterministic argmax with ASC lang on tie: max count first, then
    // min lang among those at max count (a struct-MAX can't express
    // "desc count, ASC string" in one comparator)
    val maxC = msgs.groupBy("v", "lang").agg(count(lit(1)).as("c"))
    val best = maxC.groupBy("v").agg(max(col("c")).as("cmax"))
    val winner = maxC.join(best, Seq("v"))
      .filter(col("c") === col("cmax"))
      .groupBy("v").agg(min(col("lang")).as("new_lang"),
        max(col("cmax")).cast(LongType).as("votes"))
    winner.join(labels, Seq("v"))
      .select(col("v").as("doc_id"), col("lang").as("old_lang"),
        col("new_lang"), col("votes"),
        when(col("lang") === col("new_lang"), 0L).otherwise(1L)
          .cast(LongType).as("flipped"))
      .orderBy("doc_id")
  }

  /** q_clustering_coeff — per-degree-band LOCAL clustering coefficient
    * of the candidate graph (Watts & Strogatz 1998): for each node,
    * how many of its neighbor pairs are themselves connected
    * (closed wedges = triangles at the node, possible wedges =
    * deg·(deg−1)/2), pooled per log₂ degree band as an exact ratio.
    * The structural complement to [[qDupTriangles]]' single global
    * number: a dup graph whose HIGH-degree bands stay clique-like
    * (cc → 1000) is template farms and mirrors; high-degree hubs with
    * LOW cc are boilerplate stars — different curation actions, and
    * only the per-band curve tells them apart.
    *
    * Plan: the same a<b oriented wedge→closure join pair as the
    * triangle census (each triangle once as a<b<c, then fanned to its
    * 3 member nodes — candidate-graph-sized, never corpus²), one
    * |V|-group triangle count, one left join onto degrees, a ≤64-band
    * rollup. Band pooling (Σtri/Σwedges) keeps the ratio exact
    * integer — no per-node division to lose precision or to average
    * wrong. */
  val qClusteringCoeff: Q = (s, d) => {
    val edges = Dedup.minhashCandidatePairs(s, d)
      .select(col("a"), col("b"))
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val triNodes = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val triPerNode = triNodes.select(col("x").as("v"))
      .unionAll(triNodes.select(col("y").as("v")))
      .unionAll(triNodes.select(col("z").as("v")))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    deg.join(triPerNode, Seq("v"), "left")
      .na.fill(0L, Seq("tri"))
      .withColumn("band", length(bin(col("deg"))).cast(LongType))
      .groupBy("band")
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("tri")).cast(LongType).as("n_closed"),
        sum(expr("deg * (deg - 1) div 2")).cast(LongType).as("n_wedges"))
      .withColumn("cc_permille",
        when(col("n_wedges") > 0, expr("(n_closed * 1000) div n_wedges"))
          .otherwise(0L).cast(LongType))
      .orderBy("band")
  }

  /** q_assortativity — degree assortativity of the candidate graph
    * (Newman 2002): the Pearson correlation of endpoint degrees over
    * edges, answering whether heavy duplicators preferentially link
    * to each other (r > 0: template farms form a connected rich club
    * — dedup them as a block) or to leaves (r < 0: boilerplate
    * hub-and-spoke — per-hub treatment). With M edges and per-edge
    * endpoint degrees (j,k): r = (4M·Σjk − S1²) / (2M·Σ(j²+k²) − S1²),
    * S1 = Σ(j+k) — the usual M⁻¹-normalized form cross-multiplied by
    * 4M² so everything stays integral in DECIMAL(38,0) (deg ≤ 1e6,
    * M ≤ 1e12 keeps 4M·Σjk < 1e38). The permille lands through the
    * non-negative-numerator shift ((num+den)·1000 div den − 1000,
    * num ≥ −den since r ≥ −1) so Spark's truncating div and DuckDB's
    * flooring // agree on negative r.
    *
    * Plan: one degree aggregate, two edge⋈degree equi-joins (edge-
    * list-sized), one global 4-sum rollup — the cheapest whole-graph
    * statistic after the degree histogram. */
  val qAssortativity: Q = (s, d) => {
    val edges = Dedup.minhashCandidatePairs(s, d)
      .select(col("a"), col("b"))
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .agg(
        count(lit(1)).cast(DecimalType(38, 0)).as("m"),
        sum(expr("CAST(da AS DECIMAL(38,0)) + db")).as("s1"),
        sum(expr("CAST(da AS DECIMAL(38,0)) * da"
          + " + CAST(db AS DECIMAL(38,0)) * db")).as("s2"),
        sum(expr("CAST(da AS DECIMAL(38,0)) * db")).as("sjk"))
      .select(col("m").cast(LongType).as("n_edges"),
        expr("""CAST(CASE WHEN 2 * m * s2 - s1 * s1 > 0
          THEN ((4 * m * sjk - s1 * s1) * 1000
                + (2 * m * s2 - s1 * s1) * 1000)
               div (2 * m * s2 - s1 * s1) - 1000
          ELSE 0 END AS BIGINT)""").as("assort_permille"))
  }

  /** q_harmonic_centrality — radius-2 harmonic centrality of every
    * node in the minhash candidate graph: HC₂(v) = Σ_{u≠v, d(v,u)≤2}
    * 1/d(v,u) = deg(v) + |N₂(v)|/2, emitted exact as
    * hc_permille = 1000·deg + 500·|N₂|. The influence ranking a dedup
    * triage wants — unlike raw degree it sees THROUGH one hop (a
    * template hub's near-neighbors inherit centrality), and unlike
    * PageRank it needs no iteration: two equi-joins, done.
    *
    * Scale shape: N₂ is neighbors-of-neighbors (one self-join of the
    * symmetric edge list on the shared middle vertex) minus self and
    * direct neighbors (one anti-join), DISTINCT'd before counting —
    * all candidate-graph-sized, the same wedge frame as
    * [[qDupTriangles]] (banded LSH bounds it; a hub's wedge set
    * squares, which is the identical, accepted skew story as the
    * triangle census — salting applies if a real corpus's hub degree
    * demands it). Reads the memoized spine, so the report family
    * prices the candidate generator once per session. */
  val qHarmonicCentrality: Q = (s, d) => {
    val edges = Dedup.minhashCandidatePairs(s, d).select(col("a"), col("b"))
    val sym = edges.select(col("a").as("v"), col("b").as("nbr"))
      .unionAll(edges.select(col("b").as("v"), col("a").as("nbr")))
      .localCheckpoint() // three consumers: deg, wedge join, anti join
    val deg = sym.groupBy("v").agg(count(lit(1)).as("deg"))
    val two = sym.as("s1")
      .join(sym.as("s2"), col("s1.nbr") === col("s2.v"))
      .filter(col("s2.nbr") =!= col("s1.v"))
      .select(col("s1.v").as("v"), col("s2.nbr").as("u"))
      .distinct()
    val dist2 = two.join(sym.withColumnRenamed("nbr", "u"),
        Seq("v", "u"), "left_anti")
      .groupBy("v").agg(count(lit(1)).as("n2"))
    deg.join(dist2, Seq("v"), "left")
      .select(col("v").cast(LongType).as("doc_id"),
        col("deg").cast(LongType).as("deg"),
        coalesce(col("n2"), lit(0L)).cast(LongType).as("n_dist2"),
        (lit(1000L) * col("deg") + lit(500L) * coalesce(col("n2"), lit(0L)))
          .cast(LongType).as("hc_permille"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_harmonic_centrality" -> qHarmonicCentrality,
    "q_assortativity" -> qAssortativity,
    "q_pagerank_step" -> qPagerankStep,
    "q_kcore_prune" -> qKcorePrune,
    "q_degree_histogram" -> qDegreeHistogram,
    "q_label_propagation" -> qLabelPropagation,
    "q_clustering_coeff" -> qClusteringCoeff,
    "q_dup_triangles" -> qDupTriangles)

  /** Four unrolled peel rounds for the [[qKcorePrune]] oracle — the
    * same fixed-superstep contract the engine runs, spelled as chained
    * CTEs over the shared candidate-pair CTE.
    *
    * Every `k$r`/`e$r` is `AS MATERIALIZED`: each round references its
    * predecessor ~4 times (FROM + two `IN (…)` subqueries, and `k$r`
    * reads `$prev` twice), and DuckDB 1.0 inlines non-materialized
    * CTEs at every reference — the chain re-expanded the minhash band
    * self-join ~4⁴ ≈ 256× and the r9 oracle did not terminate in
    * 20 min at sf0.01; materialized it runs in 0.25 s with an
    * identical hash (r9 VERDICT.md headline). */
  private val kcoreRoundsCte: String = (1 to 4).map { r =>
    val prev = if (r == 1) "cand" else s"e${r - 1}"
    s"""k$r AS MATERIALIZED (
       |  SELECT v FROM (
       |    SELECT v, COUNT(*) AS deg
       |    FROM (SELECT a AS v FROM $prev UNION ALL SELECT b FROM $prev)
       |    GROUP BY v) WHERE deg >= 2),
       |e$r AS MATERIALIZED (
       |  SELECT a, b FROM $prev
       |  WHERE a IN (SELECT v FROM k$r) AND b IN (SELECT v FROM k$r))"""
      .stripMargin
  }.mkString(",\n")

  val oracle: Map[String, String] = Map(
    "q_harmonic_centrality" ->
      ("WITH " + Dedup.minhashCandCte + ",\n" +
      """sym AS (SELECT a AS v, b AS nbr FROM cand
        |         UNION ALL SELECT b, a FROM cand),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY v),
        |two AS (
        |  SELECT DISTINCT s1.v, s2.nbr AS u
        |  FROM sym s1 JOIN sym s2 ON s1.nbr = s2.v
        |  WHERE s2.nbr <> s1.v),
        |dist2 AS (
        |  SELECT t.v, CAST(COUNT(*) AS BIGINT) AS n2
        |  FROM two t
        |  LEFT JOIN sym s ON s.v = t.v AND s.nbr = t.u
        |  WHERE s.nbr IS NULL
        |  GROUP BY t.v)
        |SELECT CAST(d.v AS BIGINT) AS doc_id, d.deg,
        |  CAST(COALESCE(d2.n2, 0) AS BIGINT) AS n_dist2,
        |  CAST(1000 * d.deg + 500 * COALESCE(d2.n2, 0) AS BIGINT)
        |    AS hc_permille
        |FROM deg d LEFT JOIN dist2 d2 ON d2.v = d.v
        |ORDER BY doc_id""".stripMargin),
    "q_degree_histogram" ->
      ("WITH " + Dedup.minhashCandCte + ",\n" +
      """deg AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS v FROM cand UNION ALL SELECT b FROM cand)
        |  GROUP BY v),
        |bands AS (
        |  SELECT CAST(length(bin(deg)) AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(deg) AS BIGINT) AS degree_mass
        |  FROM deg GROUP BY 1)
        |SELECT band, n_nodes, degree_mass,
        |  CAST((degree_mass * 1000) // (SUM(degree_mass) OVER ()) AS BIGINT)
        |    AS mass_permille
        |FROM bands ORDER BY band""".stripMargin),
    "q_label_propagation" ->
      ("WITH " + Dedup.minhashCandCte + ",\n" +
      """msgs AS (
        |  SELECT m.v, d.lang FROM (
        |    SELECT a AS v, b AS nbr FROM cand
        |    UNION ALL SELECT b, a FROM cand) m
        |  JOIN documents d ON d.doc_id = m.nbr),
        |votes AS (
        |  SELECT v, lang, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM msgs GROUP BY v, lang),
        |best AS (SELECT v, MAX(c) AS cmax FROM votes GROUP BY v),
        |winner AS (
        |  SELECT votes.v, MIN(lang) AS new_lang, CAST(MAX(cmax) AS BIGINT)
        |    AS votes
        |  FROM votes JOIN best ON votes.v = best.v AND votes.c = best.cmax
        |  GROUP BY votes.v)
        |SELECT w.v AS doc_id, d.lang AS old_lang, w.new_lang, w.votes,
        |  CAST(CASE WHEN d.lang = w.new_lang THEN 0 ELSE 1 END AS BIGINT)
        |    AS flipped
        |FROM winner w JOIN documents d ON d.doc_id = w.v
        |ORDER BY doc_id""".stripMargin),
    "q_kcore_prune" ->
      ("WITH " + Dedup.minhashCandCte + ",\n" + kcoreRoundsCte + "\n" +
      """SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg
        |FROM (SELECT a AS doc_id FROM e4 UNION ALL SELECT b FROM e4)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q_assortativity" ->
      ("WITH " + Dedup.minhashCandCte + ",\n" +
      """deg AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS v FROM cand UNION ALL SELECT b FROM cand)
        |  GROUP BY v),
        |sums AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
        |    CAST(SUM(da.deg + db.deg) AS HUGEINT) AS s1,
        |    CAST(SUM(CAST(da.deg AS HUGEINT) * da.deg
        |      + CAST(db.deg AS HUGEINT) * db.deg) AS HUGEINT) AS s2,
        |    CAST(SUM(CAST(da.deg AS HUGEINT) * db.deg) AS HUGEINT) AS sjk
        |  FROM cand
        |  JOIN deg da ON cand.a = da.v
        |  JOIN deg db ON cand.b = db.v)
        |SELECT CAST(m AS BIGINT) AS n_edges,
        |  CAST(CASE WHEN 2 * m * s2 - s1 * s1 > 0
        |    THEN ((4 * m * sjk - s1 * s1) * 1000
        |          + (2 * m * s2 - s1 * s1) * 1000)
        |         // (2 * m * s2 - s1 * s1) - 1000
        |    ELSE 0 END AS BIGINT) AS assort_permille
        |FROM sums""".stripMargin),
    "q_clustering_coeff" ->
      ("WITH " + Dedup.minhashCandCte + ",\n" +
      """deg AS (
        |  SELECT v, COUNT(*) AS deg
        |  FROM (SELECT a AS v FROM cand UNION ALL SELECT b FROM cand)
        |  GROUP BY v),
        |trs AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM cand e1
        |  JOIN cand e2 ON e1.b = e2.a
        |  JOIN cand e3 ON e1.a = e3.a AND e2.b = e3.b),
        |tpn AS (
        |  SELECT v, COUNT(*) AS tri FROM (
        |    SELECT x AS v FROM trs UNION ALL SELECT y FROM trs
        |    UNION ALL SELECT z FROM trs) GROUP BY v)
        |SELECT CAST(length(bin(deg.deg)) AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(COALESCE(tpn.tri, 0)) AS BIGINT) AS n_closed,
        |  CAST(SUM(deg.deg * (deg.deg - 1) // 2) AS BIGINT) AS n_wedges,
        |  CAST(CASE WHEN SUM(deg.deg * (deg.deg - 1) // 2) > 0
        |    THEN (SUM(COALESCE(tpn.tri, 0)) * 1000)
        |      // SUM(deg.deg * (deg.deg - 1) // 2)
        |    ELSE 0 END AS BIGINT) AS cc_permille
        |FROM deg LEFT JOIN tpn USING (v)
        |GROUP BY 1 ORDER BY band""".stripMargin),
    "q_dup_triangles" ->
      // concatenated, NOT interpolated into a stripMargin literal: the
      // CTE is already margin-stripped and its `||` concat operators at
      // line starts would be eaten by a second stripMargin pass
      ("WITH " + Dedup.minhashCandCte + ",\n" +
      """deg AS (
        |  SELECT v, COUNT(*) AS deg
        |  FROM (SELECT a AS v FROM cand UNION ALL SELECT b FROM cand)
        |  GROUP BY v),
        |w AS (
        |  SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
        |         COUNT(*) AS n_nodes
        |  FROM deg),
        |t AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM cand e1
        |  JOIN cand e2 ON e1.b = e2.a
        |  JOIN cand e3 ON e1.a = e3.a AND e2.b = e3.b),
        |e AS (SELECT COUNT(*) AS n_edges FROM cand)
        |SELECT e.n_edges, w.n_nodes, t.n_triangles, w.n_wedges,
        |  CAST(CASE WHEN w.n_wedges > 0
        |       THEN (3 * t.n_triangles * 1000) // w.n_wedges
        |       ELSE 0 END AS BIGINT) AS closure_permille
        |FROM e, t, w""".stripMargin),
    "q_pagerank_step" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts) // 1000, event_id) AS src
        |  FROM events),
        |edges AS (
        |  SELECT src, event_type AS dst, COUNT(*) AS weight
        |  FROM seq WHERE src IS NOT NULL GROUP BY src, dst),
        |nodes AS (SELECT DISTINCT event_type AS node FROM events),
        |nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
        |outw AS (SELECT src, SUM(weight) AS out_weight FROM edges GROUP BY src),
        |contribs AS (
        |  SELECT e.dst,
        |    CAST(SUM(((1000000 // nn.n_nodes) * 85 * e.weight)
        |         // (o.out_weight * 100)) AS BIGINT) AS in_flow
        |  FROM edges e JOIN outw o ON e.src = o.src, nn
        |  GROUP BY e.dst)
        |SELECT n.node,
        |  CAST(COALESCE(o.out_weight, 0) AS BIGINT) AS out_weight,
        |  CAST(1000000 // nn.n_nodes AS BIGINT) AS pr0_micro,
        |  CAST((15 * 1000000) // (100 * nn.n_nodes)
        |       + COALESCE(c.in_flow, 0) AS BIGINT) AS pr1_micro
        |FROM nodes n
        |CROSS JOIN nn
        |LEFT JOIN outw o ON n.node = o.src
        |LEFT JOIN contribs c ON n.node = c.dst
        |ORDER BY n.node""".stripMargin)
}
